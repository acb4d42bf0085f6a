"""D7 type-classification cascade as rules-as-data, ported from the
reference's generated CASE chain
(``notebooks/end2end/CreateLocationsWithTypes.sql:120-704``).

The reference compiles ~400 WHEN branches from scraper findings; this
module keeps the same decision ORDER and (round 6) the full ported
breadth — 330 atomic rules (``len(CASCADE_RULES)``, pinned by tests;
reference OR-groups split into one rule per alternative) — as a
priority-ordered data table.  The two reference branches deliberately
NOT ported are the dead 'editorial board is%' arm (shadowed by the
earlier paratext '%editorial board%' rule in the reference itself) and
the l.282 rxiv/ssrn/osf sub-clauses (equally unreachable behind the
l.165 sc-substring preprint rules).  The raw-type long tail lives in
``functions/ingest_typemap.py`` (1,116-key ingest dictionary).  Two
compilers read the same table:

- :func:`spark_case` — one ``F.when`` chain (a single codegen'd CASE
  expression regardless of rule count; rule count never adds plan nodes);
- :func:`duck_case` — the identical ANSI-SQL CASE text for the DuckDB
  oracle, so the correctness gate mechanically proves both stay in
  lockstep.

Rule algebra: ``(slug, [(field, op, value), ...])`` — conditions AND
together; first matching rule wins; fallback ``article``. Fields are the
reference's feature columns: ``title raw crtype host src cont abstract
doiurl genre issue fp oatype ptl srctype`` (strings, lowercased
upstream; ``fp`` = first page, ``ptl`` = landing-page <title>,
``oatype``/``srctype`` = upstream classifier hints), the derived
strings ``sc`` (``src || ' ' || cont``) and ``titlert`` (title with
trailing ``' .'`` trimmed — the reference's rtrim guard), ``nrefs``
(int), and the booleans ``single hasabs retr confabs confpap
hasjournal`` (``retr`` = upstream retraction flag; ``confabs``/
``confpap`` = the landing-page citation_conference_* meta-key flags,
reference l.107-108; ``hasjournal`` = has a journal-located sibling).

Ops: ``prefix contains suffix equals isin not_contains not_prefix
not_equals not_isin`` for strings, plus ``rlike`` whose value is a
``(pattern, example)`` pair — the example is a string that matches the
pattern, used to generate the rule's trigger row; ``nrefs0 nrefs_ge
nrefs_gt single hasabs not_hasabs`` structural, and ``flag``/
``not_flag`` for the generic boolean fields. LIKE patterns never
contain ``%``/``_`` so compilation is literal-safe on both engines;
rlike patterns stay within the regex dialect Java and RE2 agree on
(no lookaround, no \\p classes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

Cond = tuple[str, str, object]
Rule = tuple[str, list[Cond]]

_STR_FIELDS = (
    "title", "raw", "crtype", "host", "src", "cont",
    "abstract", "doiurl", "genre", "issue", "fp", "oatype", "ptl",
    "srctype",
)

_BOOL_FIELDS = ("single", "hasabs", "retr", "confabs", "confpap", "hasjournal")

# Priority-ordered; source line refs are CreateLocationsWithTypes.sql.
CASCADE_RULES: list[Rule] = [
    # -- retraction / erratum / peer-review (l.127-129)
    ("retraction", [("title", "prefix", "retraction")]),
    ("retraction", [("title", "prefix", "statement of retraction")]),
    ("retraction", [("abstract", "contains", "this retracts")]),
    ("retraction", [("abstract", "contains", "retracts the article")]),
    ("erratum", [("title", "contains", "erratum")]),
    ("erratum", [("title", "contains", "corrigendum")]),
    ("erratum", [("title", "contains", "correction to")]),
    ("erratum", [("title", "contains", "author correction")]),
    ("erratum", [("title", "contains", "publisher correction")]),
    ("erratum", [("title", "prefix", "correction")]),
    ("erratum", [("abstract", "contains", "corrects the article")]),
    ("retraction", [("retr", "flag", None), ("title", "prefix", "withdrawn")]),
    ("peer-review", [("raw", "equals", "peer-review")]),
    ("peer-review", [("title", "prefix", "review for")]),
    ("peer-review", [("title", "prefix", "decision letter")]),
    ("peer-review", [("title", "prefix", "author response")]),
    ("peer-review", [("title", "prefix", "reply on")]),
    ("peer-review", [("title", "prefix", "peer review of")]),
    ("peer-review", [("title", "prefix", "reviewer public")]),
    ("peer-review", [("title", "prefix", "comment on egusphere")]),
    # -- crossref type shortcuts (l.130-134)
    ("dissertation", [("crtype", "equals", "dissertation")]),
    ("reference-entry", [("crtype", "isin", ("reference-entry", "reference-book"))]),
    ("standard", [("crtype", "equals", "standard")]),
    ("report", [("crtype", "equals", "report-component")]),
    ("preprint", [("crtype", "equals", "posted-content-preprint")]),
    # -- URL host table (l.136-147)
    ("preprint", [("host", "isin", ("osf.io", "www.researchsquare.com"))]),
    ("dataset", [("host", "isin", ("www.encodeproject.org", "www.rcsb.org", "www.wwpdb.org"))]),
    ("software-paper", [("host", "equals", "www.softxjournal.com")]),
    ("software", [("host", "isin", ("cran.r-project.org", "demonstrations.wolfram.com"))]),
    ("peer-review", [("host", "isin", ("facultyopinions.com", "publons.com", "www.webofscience.com"))]),
    ("dissertation", [("host", "isin", ("theses.fr", "theses.hal.science"))]),
    ("reference-entry", [("host", "isin", (
        "materials.springer.com", "referenceworks.brill.com",
        "www.cabidigitallibrary.org", "www.oed.com",
        "www.oxfordartonline.com", "www.ukwhoswho.com"))]),
    ("conference-abstract", [("host", "isin", ("meetingorganizer.copernicus.org", "www.morressier.com"))]),
    ("book", [("host", "isin", ("goodreads.com", "www.goodreads.com"))]),
    ("other", [("host", "isin", ("picryl.com", "www.picryl.com"))]),
    # -- exact source-name table (l.148-162)
    ("conference-abstract", [("src", "isin", (
        "abstracts", "abstracts with programs - geological society of america",
        "academy of management proceedings", "endocrine abstracts",
        "the proceedings of the annual convention of the japanese psychological association"))]),
    ("reference-entry", [("src", "isin", (
        "brill’s new pauly", "definitions", "der neue pauly",
        "iucn red list of threatened species", "radiopaedia.org",
        "religion in geschichte und gegenwart", "springerreference",
        "the shafr guide online", "who was who", "who's who"))]),
    ("reference-entry", [("src", "equals", "encyclopédie de l’islam")]),
    ("reference-entry", [("src", "equals", "lexikon des gesamten buchwesens online")]),
    ("reference-entry", [("src", "equals", "supplementum epigraphicum graecum")]),
    ("dataset", [("src", "equals", "psyctests dataset")]),
    ("preprint", [("src", "isin", ("research square", "ssrn electronic journal"))]),
    ("data-paper", [("src", "equals", "data in brief")]),
    ("software-paper", [("src", "isin", ("softwarex", "the journal of open source software"))]),
    ("conference-paper", [("src", "isin", (
        "acta horticulturae", "ecs transactions", "iceri proceedings",
        "ifac proceedings volumes", "materials today proceedings",
        "procedia engineering"))]),
    ("peer-review", [("src", "equals", "faculty opinions – post-publication peer review of the biomedical literature")]),
    ("book-chapter", [("src", "isin", ("apress ebooks", "jaypee brothers medical publishers (p) ltd. ebooks"))]),
    ("book-review", [("src", "isin", ("bulletin of the center for children's books", "choice reviews online"))]),
    ("other", [("src", "equals", "electronic enlightenment scholarly edition of correspondence")]),
    ("report", [("src", "equals", "national bureau of economic research")]),
    ("editorial", [("src", "equals", "synfacts")]),
    # -- source/container substring table (l.163-171)
    ("dataset", [("sc", "contains", "datasets")]),
    ("conference-paper", [("sc", "contains", "web of conferences")]),
    ("preprint", [("sc", "contains", "rxiv")]),
    ("preprint", [("sc", "contains", "preprint")]),
    ("reference-entry", [("sc", "contains", "dictionary")]),
    ("reference-entry", [("sc", "contains", "encyclopedia")]),
    ("reference-entry", [("sc", "contains", "lexicon")]),
    ("conference-abstract", [("sc", "contains", "meeting abstracts")]),
    # (list order is semantics-free; the lecture-notes value leads so the
    # generated trigger row is not shadowed by the sc-contains rule above)
    ("conference-paper", [("src", "isin", (
        "lecture notes on data engineering and communications technologies",
        "e3s web of conferences",
        "procedia - social and behavioral sciences"))]),
    ("conference-abstract", [("src", "equals", "european urology supplements")]),
    ("dataset", [("src", "equals", "gisaid")]),
    ("dataset", [("sc", "contains", "encode")]),
    ("conference-paper", [("sc", "contains", "spie proceedings")]),
    ("dataset", [("sc", "contains", "worldwide protein data bank")]),
    ("conference-paper", [("sc", "contains", "sae technical paper series")]),
    ("conference-paper", [("sc", "contains", "ifmbe proceedings")]),
    ("conference-paper", [("sc", "contains", "advances in social science, education and humanities research")]),
    ("conference-paper", [("sc", "contains", "conference on lasers and electro-optics")]),
    ("conference-paper", [("sc", "contains", "sgem international multidisciplinary scientific geoconference")]),
    ("dataset", [("sc", "contains", "morphosource")]),
    # -- doi/url keys (l.180)
    ("conference-abstract", [("doiurl", "contains", "meetingabstracts")]),
    ("conference-abstract", [("doiurl", "contains", "meeting-abstracts")]),
    # -- early title paratext + url tokens (l.181-186)
    ("paratext", [("title", "prefix", "editorial board")]),
    ("paratext", [("title", "prefix", "front matter")]),
    # book-front-matter paratext, guarded by book-ish raw/crossref type (l.182)
    ("paratext", [("title", "prefix", "preface"),
                  ("raw", "isin", ("book-chapter", "book-part", "chapter", "book-section"))]),
    ("paratext", [("title", "prefix", "preface"),
                  ("crtype", "isin", ("book-chapter", "monograph", "edited-book"))]),
    ("paratext", [("title", "prefix", "appendix"),
                  ("raw", "isin", ("book-chapter", "book-part", "chapter", "book-section"))]),
    ("paratext", [("title", "prefix", "appendix"),
                  ("crtype", "isin", ("book-chapter", "monograph", "edited-book"))]),
    ("paratext", [("title", "prefix", "proofs of"),
                  ("raw", "isin", ("book-chapter", "book-part", "chapter", "book-section"))]),
    ("paratext", [("title", "prefix", "proofs of"),
                  ("crtype", "isin", ("book-chapter", "monograph", "edited-book"))]),
    ("reference-entry", [("doiurl", "contains", "referenceworkentry")]),
    ("dissertation", [("doiurl", "contains", "/thesis/"), ("crtype", "equals", "")]),
    # url path tokens theses/dissertations (l.185; token match = the
    # reference's regexp_extract_all('[a-z]{3,}') membership test)
    ("dissertation", [("doiurl", "rlike", (r"(^|[^a-z])theses([^a-z]|$)", "x.org/theses/9")),
                      ("crtype", "equals", ""), ("srctype", "not_equals", "journal")]),
    ("dissertation", [("doiurl", "rlike", (r"(^|[^a-z])dissertations([^a-z]|$)", "x.org/dissertations/9")),
                      ("crtype", "equals", ""), ("srctype", "not_equals", "journal")]),
    # landing-page citation_conference_* meta keys (l.186-187)
    ("conference-abstract", [("confabs", "flag", None)]),
    ("conference-paper", [("confpap", "flag", None)]),
    # -- dc.type / genre values (l.189-205; one rule per value, the
    # reference's one-WHEN-per-value shape)
    ("book-review", [("genre", "equals", "book-review")]),
    ("book-review", [("genre", "equals", "bookreview")]),
    ("book-review", [("genre", "equals", "book reviews")]),
    ("book-review", [("genre", "equals", "book review")]),
    ("book-review", [("genre", "equals", "reseñas")]),
    ("dissertation", [("genre", "equals", "thesis")]),
    ("dissertation", [("genre", "equals", "dissertação")]),
    ("dissertation", [("genre", "equals", "doctoral dissertation")]),
    ("dissertation", [("genre", "equals", "pg_thesis")]),
    ("editorial", [("genre", "equals", "editorial")]),
    ("editorial", [("genre", "equals", "editorialnotes")]),
    ("editorial", [("genre", "equals", "article-commentary")]),
    ("conference-abstract", [("genre", "equals", "meeting-report")]),
    ("conference-abstract", [("genre", "equals", "congress-abstract")]),
    ("report", [("genre", "equals", "oxan-executive-summary")]),
    ("other", [("genre", "equals", "news")]),
    ("book-chapter", [("genre", "equals", "chapter")]),
    # -- landing-page <title> cue (l.206)
    ("letter", [("ptl", "prefix", "reply")]),
    # -- supplementary materials (l.207)
    ("supplementary-materials", [("title", "prefix", "supplementary")]),
    ("supplementary-materials", [("title", "prefix", "supplemental")]),
    ("supplementary-materials", [("title", "contains", "supplementary figure")]),
    ("supplementary-materials", [("title", "contains", "supplementary table")]),
    ("supplementary-materials", [("title", "contains", "supplemental material")]),
    ("supplementary-materials", [("title", "contains", "figure from")]),
    # -- paratext title-prefix lexicon (l.208)
    ("paratext", [("title", "prefix", "table of contents")]),
    ("paratext", [("title", "prefix", "contents")]),
    ("paratext", [("title", "prefix", "back matter")]),
    ("paratext", [("title", "prefix", "frontmatter")]),
    ("paratext", [("title", "prefix", "front cover")]),
    ("paratext", [("title", "prefix", "subject index")]),
    ("paratext", [("title", "prefix", "author index")]),
    ("paratext", [("title", "prefix", "name index")]),
    ("paratext", [("title", "prefix", "list of figures")]),
    ("paratext", [("title", "prefix", "list of tables")]),
    ("paratext", [("title", "prefix", "list of contributors")]),
    ("paratext", [("title", "prefix", "list of abbreviations")]),
    ("paratext", [("title", "prefix", "list of illustrations")]),
    ("paratext", [("title", "prefix", "list of plates")]),
    ("paratext", [("title", "prefix", "bibliography")]),
    ("paratext", [("title", "prefix", "abbreviation")]),
    ("paratext", [("title", "prefix", "acknowledgment")]),
    ("paratext", [("title", "prefix", "acknowledgement")]),
    ("paratext", [("title", "prefix", "dedication")]),
    ("paratext", [("title", "prefix", "contributors")]),
    ("paratext", [("title", "prefix", "about the author")]),
    ("paratext", [("title", "prefix", "about the editor")]),
    ("paratext", [("title", "prefix", "copyright")]),
    ("paratext", [("title", "prefix", "title page")]),
    ("paratext", [("title", "prefix", "masthead")]),
    ("paratext", [("title", "prefix", "frontispiece")]),
    ("paratext", [("title", "prefix", "titelei")]),
    ("paratext", [("title", "prefix", "inhaltsverzeichnis")]),
    ("paratext", [("title", "prefix", "sachregister")]),
    ("paratext", [("title", "prefix", "literaturverzeichnis")]),
    ("paratext", [("title", "prefix", "inhalt")]),
    ("paratext", [("title", "prefix", "session details")]),
    ("paratext", [("title", "prefix", "forthcoming")]),
    ("paratext", [("title", "prefix", "calendar")]),
    ("paratext", [("title", "prefix", "general index")]),
    ("paratext", [("title", "prefix", "back cover")]),
    ("paratext", [("title", "prefix", "inside front cover")]),
    ("paratext", [("title", "prefix", "prelims")]),
    ("paratext", [("title", "prefix", "preliminary material")]),
    ("paratext", [("title", "prefix", "backmatter")]),
    ("paratext", [("title", "prefix", "books received")]),
    ("paratext", [("title", "prefix", "works cited")]),
    ("paratext", [("title", "prefix", "about the contributors")]),
    ("paratext", [("title", "prefix", "author biograph")]),
    ("paratext", [("title", "prefix", "expediente")]),
    ("paratext", [("title", "prefix", "table des mati")]),
    ("paratext", [("title", "prefix", "remerciements")]),
    # -- paratext title-contains lexicon (l.209)
    ("paratext", [("title", "contains", "issue information")]),
    ("paratext", [("title", "contains", "masthead")]),
    ("paratext", [("title", "contains", "editorial board")]),
    ("paratext", [("title", "contains", "instructions for authors")]),
    ("paratext", [("title", "contains", "list of reviewers")]),
    ("paratext", [("title", "contains", "acknowledgment of reviewers")]),
    ("paratext", [("title", "contains", "acknowledgement of reviewers")]),
    ("paratext", [("title", "contains", "cover image")]),
    ("paratext", [("title", "contains", "information for authors")]),
    ("paratext", [("title", "contains", "society information")]),
    ("paratext", [("title", "contains", "information for contributors")]),
    ("paratext", [("title", "contains", "information for readers")]),
    ("paratext", [("title", "contains", "notes for contributors")]),
    ("paratext", [("title", "contains", "notes on contributors")]),
    ("paratext", [("title", "contains", "call for papers")]),
    ("paratext", [("title", "contains", "call for submissions")]),
    ("paratext", [("title", "contains", "call for abstracts")]),
    ("paratext", [("title", "contains", "guide for authors")]),
    ("paratext", [("title", "contains", "impressum")]),
    ("paratext", [("title", "contains", "publication information")]),
    ("paratext", [("title", "contains", "reviewer acknowledgement")]),
    ("paratext", [("title", "equals", "notes")]),
    ("paratext", [("title", "equals", "peer review statement")]),
    # -- committees (l.211-212)
    ("paratext", [("title", "prefix", "program committee")]),
    ("paratext", [("title", "prefix", "organizing committee")]),
    ("paratext", [("title", "prefix", "workshop committee")]),
    ("paratext", [("title", "prefix", "conference committee")]),
    ("paratext", [("title", "prefix", "scientific committee")]),
    ("paratext", [("title", "prefix", "technical program committee")]),
    ("paratext", [("title", "prefix", "steering committee")]),
    ("paratext", [("title", "rlike", (
        r"^(program |organizing |scientific |technical |workshop |conference |steering )?committee(s)?( members| list(ing)?s?)?$",
        "committee members"))]),
    # -- index / references / list-of with first-page or structure guards (l.212)
    ("paratext", [("title", "prefix", "index")]),
    ("paratext", [("title", "prefix", "references"),
                  ("fp", "isin", ("i", "ii", "iii", "iv", "ix", "v", "vi", "vii",
                                  "viii", "x", "xi", "xii", "xiii", "xiv", "xv"))]),
    ("paratext", [("title", "prefix", "references"), ("nrefs", "nrefs0", None)]),
    ("paratext", [("title", "prefix", "references"), ("hasabs", "not_hasabs", None)]),
    ("paratext", [("title", "prefix", "list of"),
                  ("fp", "isin", ("i", "ii", "iii", "iv", "ix", "v", "vi", "vii",
                                  "viii", "x", "xi", "xii", "xiii", "xiv", "xv"))]),
    ("paratext", [("title", "prefix", "list of"), ("nrefs", "nrefs0", None)]),
    ("paratext", [("title", "prefix", "list of"), ("hasabs", "not_hasabs", None)]),
    # -- software / standard / dataset titles (l.214-216)
    ("software-paper", [("title", "contains", "python package")]),
    ("standard", [("title", "prefix", "din en")]),
    ("standard", [("title", "prefix", "specification for")]),
    ("standard", [("title", "prefix", "test method")]),
    ("standard", [("title", "contains", "englische fassung")]),
    ("dataset", [("title", "prefix", "encsr")]),
    # -- book reviews (l.217)
    ("book-review", [("title", "prefix", "book review")]),
    ("book-review", [("title", "prefix", "review of the book")]),
    ("book-review", [("title", "prefix", "reseña del libro")]),
    ("book-review", [("title", "contains", " isbn")]),
    ("book-review", [("title", "contains", "edited by")]),
    ("book-review", [("title", "contains", "pp."), ("title", "contains", "isbn")]),
    ("book-review", [("title", "contains", "pp."), ("title", "contains", "press")]),
    # -- editorials (l.218; 'editorial board is%' is dead in the
    # reference too — the l.209 paratext '%editorial board%' contains
    # rule always fires first, so it is deliberately not ported)
    ("editorial", [("title", "prefix", "guest editorial")]),
    ("editorial", [("title", "prefix", "editorial comment")]),
    ("editorial", [("title", "prefix", "guest editor")]),
    ("editorial", [("title", "prefix", "commentary on")]),
    ("editorial", [("title", "prefix", "message from")]),
    ("editorial", [("title", "prefix", "editorial:")]),
    ("editorial", [("title", "prefix", "preface:")]),
    ("editorial", [("title", "prefix", "préambule")]),
    ("editorial", [("title", "prefix", "éditorial")]),
    ("editorial", [("title", "prefix", "editors' note")]),
    ("editorial", [("title", "prefix", "editors note")]),
    ("editorial", [("title", "prefix", "special thanks")]),
    ("editorial", [("title", "prefix", "nota de la directora")]),
    ("editorial", [("title", "prefix", "note from the editor")]),
    ("editorial", [("title", "prefix", "interview with")]),
    ("editorial", [("title", "prefix", "interview:")]),
    ("editorial", [("title", "prefix", "entrevista")]),
    ("editorial", [("title", "contains", "from the editor")]),
    ("editorial", [("title", "contains", "special issue on")]),
    ("editorial", [("title", "contains", "to the special issue")]),
    ("editorial", [("title", "contains", "commentary:")]),
    ("editorial", [("title", "prefix", "editorial"), ("title", "not_contains", "board")]),
    # -- letters (l.219, 226)
    ("letter", [("title", "prefix", "letter to the")]),
    ("letter", [("title", "prefix", "reply to")]),
    ("letter", [("title", "prefix", "in reply")]),
    ("letter", [("title", "prefix", "reader response")]),
    ("letter", [("title", "prefix", "comments on the article")]),
    ("letter", [("title", "contains", "to the editor")]),
    ("letter", [("title", "contains", "authors' reply")]),
    ("letter", [("title", "contains", "reply to comment")]),
    ("letter", [("title", "prefix", "reply"), ("single", "single", None)]),
    ("letter", [("title", "prefix", "comment on"), ("single", "single", None)]),
    ("letter", [("title", "prefix", "correspondence")]),
    # -- library subject guides (l.220)
    ("libguides", [("title", "prefix", "libguides")]),
    ("libguides", [("title", "prefix", "all guides")]),
    ("libguides", [("title", "prefix", "research guides")]),
    ("letter", [("title", "prefix", "re:")]),
    ("letter", [("title", "prefix", "the authors reply")]),
    ("letter", [("title", "prefix", "comment on:")]),
    # -- reviews / misc titles (l.220-231)
    ("review", [("title", "contains", "narrative review")]),
    ("review", [("title", "contains", "mini-review")]),
    ("review", [("title", "contains", "meta-analysis of")]),
    ("editorial", [("title", "prefix", "discussion of")]),
    ("dataset", [("title", "prefix", "data for ")]),
    ("review", [("title", "contains", "systematic literature review"),
                ("title", "not_contains", "case report"),
                ("title", "not_contains", "case study")]),
    ("other", [("title", "contains", "in memoriam")]),
    ("other", [("title", "contains", "autograph letter")]),
    ("other", [("title", "contains", "obituary")]),
    ("conference-abstract", [("title", "prefix", "abstract")]),
    # -- structural conference-abstract guards (l.233-236)
    ("conference-abstract", [("sc", "contains", "abstract"), ("single", "single", None)]),
    ("conference-abstract", [("sc", "contains", "abstract"),
        ("nrefs", "nrefs0", None), ("hasabs", "hasabs", None)]),
    ("conference-abstract", [("src", "contains", "supplement"), ("single", "single", None), ("nrefs", "nrefs0", None)]),
    ("conference-abstract", [("issue", "contains", "suppl"), ("single", "single", None)]),
    # journal-article with a supplement-coded issue number (l.230)
    ("conference-abstract", [("raw", "equals", "journal-article"),
        ("nrefs", "nrefs0", None), ("single", "single", None),
        ("issue", "rlike", (r"^s[0-9]", "s12"))]),
    ("conference-abstract", [("raw", "equals", "journal-article"),
        ("nrefs", "nrefs0", None), ("single", "single", None),
        ("issue", "rlike", (r"^[0-9]+s$", "31s"))]),
    # -- abstract-text cues (l.237-241)
    ("conference-abstract", [("abstract", "contains", "abstracts of presentations")]),
    ("conference-abstract", [("abstract", "contains", "searchable abstracts")]),
    ("book-review", [("abstract", "prefix", "reviewed by")]),
    ("data-paper", [("abstract", "contains", "this data article")]),
    ("editorial", [("abstract", "contains", "this editorial")]),
    # -- guarded single-type sources (l.242-246)
    ("conference-abstract", [("src", "isin", (
        "communications in computer and information science", "energy procedia",
        "lecture notes in civil engineering", "lecture notes in computer science",
        "procedia computer science")),
        ("nrefs", "nrefs0", None), ("single", "single", None), ("hasabs", "hasabs", None)]),
    ("conference-paper", [("src", "isin", (
        "communications in computer and information science", "energy procedia",
        "lecture notes in civil engineering", "lecture notes in computer science",
        "procedia computer science"))]),
    ("data-paper", [("src", "equals", "scientific data")]),
    ("conference-abstract", [("sc", "contains", "journal of physics: conference series"),
        ("nrefs", "nrefs0", None), ("single", "single", None), ("hasabs", "hasabs", None)]),
    ("conference-paper", [("sc", "contains", "journal of physics: conference series")]),
    # -- session-code titles: 'mp-102.' / 'a12:' etc. with no references
    # are conference session abstracts (l.240)
    ("conference-abstract", [
        ("title", "rlike", (r"^[a-z]{1,3}-?[0-9]{2,5}[.:\s]", "mp-102. study of things")),
        ("nrefs", "nrefs0", None),
        ("raw", "not_isin", ("dataset", "database"))]),
    # -- structural review guards (l.248-249)
    ("review", [("title", "contains", "systematic review"), ("nrefs", "nrefs_gt", 0)]),
    ("review", [("oatype", "equals", "review"), ("nrefs", "nrefs_ge", 25),
                ("hasabs", "hasabs", None)]),
    # -- conference venue substrings, guarded split (l.251-256)
    ("conference-abstract", [("sc", "contains", "conference"),
        ("nrefs", "nrefs0", None), ("single", "single", None), ("hasabs", "hasabs", None)]),
    ("conference-paper", [("sc", "contains", "conference")]),
    ("conference-abstract", [("sc", "contains", "symposium"),
        ("nrefs", "nrefs0", None), ("single", "single", None), ("hasabs", "hasabs", None)]),
    ("conference-paper", [("sc", "contains", "symposium")]),
    ("conference-abstract", [("sc", "contains", "workshop"),
        ("nrefs", "nrefs0", None), ("single", "single", None), ("hasabs", "hasabs", None)]),
    ("conference-paper", [("sc", "contains", "workshop")]),
    # -- proceedings raw types (l.257-260)
    ("conference-abstract", [("raw", "equals", "proceedings-article"),
        ("nrefs", "nrefs0", None), ("single", "single", None), ("hasabs", "hasabs", None)]),
    ("conference-paper", [("raw", "equals", "proceedings-article")]),
    # repo-sourced 'proceedings' raw type (no crossref type, and not a
    # whole-proceedings title) splits like a conference item (l.251-252)
    ("conference-abstract", [("raw", "equals", "proceedings"),
        ("crtype", "equals", ""), ("title", "not_prefix", "proceedings"),
        ("nrefs", "nrefs0", None), ("single", "single", None), ("hasabs", "hasabs", None)]),
    ("conference-paper", [("raw", "equals", "proceedings"),
        ("crtype", "equals", ""), ("title", "not_prefix", "proceedings")]),
    # -- crossref fallthrough (l.261-263)
    ("paratext", [("crtype", "equals", "journal-issue")]),
    ("book", [("crtype", "isin", ("edited-book", "monograph"))]),
    ("reference-entry", [("raw", "equals", "reference-entry")]),
    ("dissertation", [("raw", "equals", "dissertation")]),
    # -- trailing-title review guard (l.264-265; titlert = title with
    # trailing ' .' trimmed, the reference's rtrim(f_title, ' .'))
    ("review", [("titlert", "suffix", "a review"), ("nrefs", "nrefs_ge", 20)]),
    ("review", [("titlert", "suffix", "a literature review"), ("nrefs", "nrefs_ge", 20)]),
    ("review", [("title", "contains", "scientometric review"), ("nrefs", "nrefs_ge", 20)]),
    ("review", [("title", "contains", "a meta-analysis"), ("nrefs", "nrefs_ge", 20)]),
    # -- eu-repo semantics (l.266-271)
    ("conference-paper", [("raw", "contains", "eu-repo/semantics/"), ("raw", "suffix", "/conferenceobject")]),
    ("book-chapter", [("raw", "contains", "eu-repo/semantics/"), ("raw", "suffix", "/bookpart")]),
    ("dissertation", [("raw", "contains", "eu-repo/semantics/"), ("raw", "suffix", "/doctoralthesis")]),
    ("dissertation", [("raw", "contains", "eu-repo/semantics/"), ("raw", "suffix", "/masterthesis")]),
    ("article", [("raw", "contains", "eu-repo/semantics/"), ("raw", "suffix", "/article")]),
    ("report", [("raw", "contains", "eu-repo/semantics/"), ("raw", "suffix", "/report")]),
    ("other", [("raw", "contains", "eu-repo/semantics/"), ("raw", "suffix", "/other")]),
    # -- repository raw-type lexicon (l.272-291)
    ("dissertation", [("raw", "contains", "thesis")]),
    ("dissertation", [("raw", "contains", "väitöskirja")]),
    ("dissertation", [("raw", "contains", "hochschulschrift")]),
    ("dissertation", [("raw", "prefix", "tesis")]),
    ("dissertation", [("raw", "contains", "bakalářská práce")]),
    ("report", [("raw", "contains", "final year project")]),
    ("book-chapter", [("raw", "isin", ("chapter", "bookpart"))]),
    ("conference-paper", [("raw", "suffix", "conferencepaper")]),
    ("report", [("raw", "equals", "researchreport")]),
    ("supplementary-materials", [("raw", "equals", "figure")]),
    ("other", [("raw", "equals", "software,multimedia")]),
    ("software", [("raw", "equals", "software")]),
    ("other", [("raw", "contains", "printed serial")]),
    ("other", [("raw", "isin", ("image", "physicalobject", "audiovisual", "sound"))]),
    ("book", [("raw", "contains", "monograph")]),
    ("book", [("raw", "contains", "monograf")]),
    # -- crossref raw fallthrough (l.292-302; the preprint branch keeps
    # the reference's l.282 guards: eu-repo strings only count via their
    # /preprint suffix, journal-located works are never preprints)
    ("preprint", [("raw", "contains", "preprint"),
                  ("raw", "not_contains", "eu-repo"),
                  ("srctype", "not_equals", "journal"),
                  ("hasjournal", "not_flag", None)]),
    ("preprint", [("raw", "contains", "eu-repo/semantics/"),
                  ("raw", "suffix", "/preprint"),
                  ("hasjournal", "not_flag", None)]),
    ("book-chapter", [("raw", "isin", ("book-chapter", "book-part"))]),
    ("reference-entry", [("raw", "equals", "book-section")]),
    ("book", [("raw", "isin", ("book", "edited-book", "book-set"))]),
    ("report", [("raw", "equals", "report")]),
    ("other", [("raw", "equals", "posted-content")]),
    ("dataset", [("raw", "isin", ("dataset", "database"))]),
    # the late proceedings->paratext branch (l.299) is only reachable
    # when the mid-tier conference split (l.251-252) declined: a
    # whole-proceedings title or a crossref-typed record
    ("paratext", [("raw", "equals", "proceedings"), ("title", "prefix", "proceedings")]),
    ("paratext", [("raw", "equals", "proceedings"), ("crtype", "equals", "proceedings")]),
    ("other", [("raw", "equals", "other")]),
    # -- structural paratext fallback (reference dict default tier)
    ("paratext", [("nrefs", "nrefs0", None), ("hasabs", "not_hasabs", None),
                  ("title", "equals", "")]),
]

FALLBACK = "article"


def _esc(s: str) -> str:
    return s.replace("'", "''")


def _sql_quote(s: str) -> str:
    return "'" + _esc(s) + "'"


def _cond_sql(field: str, op: str, value: object) -> str:
    if op == "prefix":
        return f"{field} LIKE '{_esc(str(value))}%'"
    if op == "suffix":
        return f"{field} LIKE '%{_esc(str(value))}'"
    if op == "contains":
        return f"{field} LIKE '%{_esc(str(value))}%'"
    if op == "not_contains":
        return f"{field} NOT LIKE '%{_esc(str(value))}%'"
    if op == "equals":
        return f"{field} = {_sql_quote(str(value))}"
    if op == "not_equals":
        return f"{field} <> {_sql_quote(str(value))}"
    if op == "not_prefix":
        return f"{field} NOT LIKE '{_esc(str(value))}%'"
    if op == "isin":
        vals = ", ".join(_sql_quote(v) for v in value)
        return f"{field} IN ({vals})"
    if op == "not_isin":
        vals = ", ".join(_sql_quote(v) for v in value)
        return f"{field} NOT IN ({vals})"
    if op == "rlike":
        pattern, _example = value
        return f"regexp_matches({field}, {_sql_quote(pattern)})"
    if op == "flag":
        return field
    if op == "not_flag":
        return f"NOT {field}"
    if op == "nrefs0":
        return "nrefs = 0"
    if op == "nrefs_ge":
        return f"nrefs >= {int(value)}"
    if op == "nrefs_gt":
        return f"nrefs > {int(value)}"
    if op == "single":
        return "single"
    if op == "hasabs":
        return "hasabs"
    if op == "not_hasabs":
        return "NOT hasabs"
    raise ValueError(f"unknown op {op!r}")


def duck_case(emit_index: bool = False) -> str:
    """The cascade as DuckDB CASE text. Expects columns named like the
    rule fields plus derived ``sc`` (build it in the enclosing query)."""
    whens = []
    for i, (slug, conds) in enumerate(CASCADE_RULES):
        pred = " AND ".join(_cond_sql(f, op, v) for f, op, v in conds)
        out = str(i) if emit_index else _sql_quote(slug)
        whens.append(f"WHEN {pred} THEN {out}")
    fallback = "-1" if emit_index else _sql_quote(FALLBACK)
    return "CASE " + " ".join(whens) + f" ELSE {fallback} END"


def _cond_col(cols: dict[str, Column], field: str, op: str, value: object) -> Column:
    c = cols[field]
    if op == "prefix":
        return c.startswith(str(value))
    if op == "suffix":
        return c.endswith(str(value))
    if op == "contains":
        return c.contains(str(value))
    if op == "not_contains":
        return ~c.contains(str(value))
    if op == "equals":
        return c == str(value)
    if op == "not_equals":
        return c != str(value)
    if op == "not_prefix":
        return ~c.startswith(str(value))
    if op == "isin":
        return c.isin(*value)
    if op == "not_isin":
        return ~c.isin(*value)
    if op == "rlike":
        pattern, _example = value
        return c.rlike(pattern)
    if op == "flag":
        return c
    if op == "not_flag":
        return ~c
    if op == "nrefs0":
        return cols["nrefs"] == 0
    if op == "nrefs_ge":
        return cols["nrefs"] >= int(value)
    if op == "nrefs_gt":
        return cols["nrefs"] > int(value)
    if op == "single":
        return cols["single"]
    if op == "hasabs":
        return cols["hasabs"]
    if op == "not_hasabs":
        return ~cols["hasabs"]
    raise ValueError(f"unknown op {op!r}")


def spark_case(cols: dict[str, Column], emit_index: bool = False) -> Column:
    """The cascade as ONE flat CaseWhen over the caller's feature
    columns (must include the derived ``sc`` and ``titlert``).

    Branches chain forward with ``Column.when`` so Catalyst holds a
    single CaseWhen node with a flat branch list — the reversed
    ``F.when(...).otherwise(prev)`` fold would nest 330 CaseWhen nodes
    and overflow the JVM stack during expression conversion."""
    expr: Column | None = None
    for i, (slug, conds) in enumerate(CASCADE_RULES):
        pred = None
        for f, op, v in conds:
            c = _cond_col(cols, f, op, v)
            pred = c if pred is None else (pred & c)
        out = F.lit(i) if emit_index else F.lit(slug)
        expr = F.when(pred, out) if expr is None else expr.when(pred, out)
    assert expr is not None
    return expr.otherwise(F.lit(-1) if emit_index else F.lit(FALLBACK))


def trigger_row(rule_idx: int) -> dict[str, object]:
    """A corpus row designed to fire rule ``rule_idx`` (and, by table
    order, no earlier rule — pinned by tests/test_typecascade.py)."""
    row: dict[str, object] = {f: "" for f in _STR_FIELDS}
    row.update({f: False for f in _BOOL_FIELDS})
    row.update({"title": "untitled study of things",
                "src": "plain journal", "nrefs": 5,
                "single": False, "hasabs": True})
    _, conds = CASCADE_RULES[rule_idx]
    parts: dict[str, dict[str, str]] = {}
    for f, op, v in conds:
        if op in ("nrefs0",):
            row["nrefs"] = 0
        elif op == "nrefs_ge":
            row["nrefs"] = int(v)
        elif op == "nrefs_gt":
            row["nrefs"] = int(v) + 1
        elif op == "single":
            row["single"] = True
        elif op == "hasabs":
            row["hasabs"] = True
        elif op == "not_hasabs":
            row["hasabs"] = False
        elif op == "flag":
            row[f] = True
        elif op == "not_flag":
            row[f] = False
        elif op == "rlike":
            row[f] = v[1]  # the pattern's example string
        elif op in ("not_contains", "not_prefix", "not_equals", "not_isin"):
            continue  # defaults already fail to match
        elif op == "contains":
            # multiple contains on one field accumulate (joined bare, so
            # the composite never introduces a ' pattern' an earlier
            # space-anchored contains rule would also match)
            parts.setdefault(f, {}).setdefault("contains_all", []).append(str(v))
        else:
            parts.setdefault(f, {})[op] = (
                v[0] if op == "isin" else str(v)
            )
    for f, ops in parts.items():
        # Derived fields route to their source column: sc is built from
        # src||' '||cont, titlert from title (trim-trailing is a no-op
        # on the letter-final example strings the rules use).
        target = {"sc": "cont", "titlert": "title"}.get(f, f)
        if "equals" in ops or "isin" in ops:
            row[target] = ops.get("equals", ops.get("isin"))
        else:
            val = ops.get("prefix", "")
            mid = "".join(ops.get("contains_all", []))
            if mid and not (val and mid in val):
                val = (val + " " if val else "zz ") + mid
            suf = ops.get("suffix", "")
            if suf and not val.endswith(suf):
                val = val + suf
            elif not suf and val and f in ("title", "abstract"):
                val = val + " zz"
            row[target] = val
    return row


def corpus() -> list[dict[str, object]]:
    """One trigger row per rule, plus one fallback row — the golden-test
    corpus for the whole cascade (>=100 rules exercised by construction).
    """
    rows = [trigger_row(i) for i in range(len(CASCADE_RULES))]
    rows.append(
        {f: "" for f in _STR_FIELDS}
        | {f: False for f in _BOOL_FIELDS}
        | {
            "title": "untitled study of things", "src": "plain journal",
            "nrefs": 5, "single": False, "hasabs": True,
        }
    )
    for i, r in enumerate(rows):
        r["case_id"] = i
    return rows


# Per-provenance raw-type dictionary fallback for rows the cascade
# defaulted to article — the reference's ``dict_map`` VALUES table
# (CreateLocationsWithTypes.sql:460-683, all 221 entries) as data.
# (family, raw_type_lower) -> mapped_type; families repo/datacite/
# crossref/pubmed mirror the provenance fold in the final select
# (l.691-695).
DICT_MAP: list[tuple[str, str, str]] = [
    ("repo", "acceptedversion", "article"),
    ("repo", "article", "article"),
    ("repo", "article / letter to editor", "article"),
    ("repo", "artigo de jornal", "article"),
    ("repo", "award/grant", "award"),
    ("repo", "bachelor thesis", "dissertation"),
    ("repo", "bachelorthesis", "dissertation"),
    ("repo", "book", "book"),
    ("repo", "book article", "book-chapter"),
    ("repo", "book part", "book-chapter"),
    ("repo", "book sections", "book-chapter"),
    ("repo", "bookpart", "book-chapter"),
    ("repo", "books", "book"),
    ("repo", "chapter, part of book", "book-chapter"),
    ("repo", "chemical structures", "other"),
    ("repo", "conference paper", "article"),
    ("repo", "conference papers", "article"),
    ("repo", "conferencecontribution", "article"),
    ("repo", "conferenceitem", "article"),
    ("repo", "conferenceobject", "article"),
    ("repo", "conferencepaper", "article"),
    ("repo", "conferenceposter", "article"),
    ("repo", "conferenceproceedings", "article"),
    ("repo", "contributiontoperiodical", "article"),
    ("repo", "creative project", "other"),
    ("repo", "dataset", "dataset"),
    ("repo", "dataset/mass spectrometry", "dataset"),
    ("repo", "diplomová práce", "dissertation"),
    ("repo", "dissertation", "dissertation"),
    ("repo", "dissertation-reproduction (electronic)", "dissertation"),
    ("repo", "dissertação", "dissertation"),
    ("repo", "doc-type:article", "article"),
    ("repo", "doc-type:bookpart", "book-chapter"),
    ("repo", "doc-type:doctoralthesis", "dissertation"),
    ("repo", "doctor of philosophy", "dissertation"),
    ("repo", "doctoral thesis", "dissertation"),
    ("repo", "doctoral_dissertation", "dissertation"),
    ("repo", "doctoralthesis", "dissertation"),
    ("repo", "electronic dissertation", "dissertation"),
    ("repo", "hochschulschrift", "dissertation"),
    ("repo", "http://purl.org/coar/resource_type/c_18gh", "report"),
    ("repo", "http://purl.org/coar/resource_type/c_18ws", "report"),
    ("repo", "http://purl.org/coar/resource_type/c_2f33", "book"),
    ("repo", "http://purl.org/coar/resource_type/c_3248", "book-chapter"),
    ("repo", "http://purl.org/coar/resource_type/c_46ec", "dissertation"),
    ("repo", "http://purl.org/coar/resource_type/c_5794", "conference-paper"),
    ("repo", "http://purl.org/coar/resource_type/c_8042", "report"),
    ("repo", "http://purl.org/coar/resource_type/c_816b", "preprint"),
    ("repo", "http://purl.org/coar/resource_type/c_ba08", "review"),
    ("repo", "http://purl.org/coar/resource_type/c_beb9", "dataset"),
    ("repo", "http://purl.org/coar/resource_type/c_db06", "dissertation"),
    ("repo", "http://purl.org/coar/resource_type/c_dcae04bc", "review"),
    ("repo", "http://purl.org/coar/resource_type/c_efa0", "conference-abstract"),
    ("repo", "image", "other"),
    ("repo", "info:ulb-repo/semantics/openurl/article", "article"),
    ("repo", "inproceedings", "article"),
    ("repo", "journal article", "article"),
    ("repo", "journal articles", "article"),
    ("repo", "journal contribution", "article"),
    ("repo", "konferenzschrift", "article"),
    ("repo", "learning object", "other"),
    ("repo", "lecture", "other"),
    ("repo", "letter", "article"),
    ("repo", "libros", "book"),
    ("repo", "manuscript", "article"),
    ("repo", "master thesis", "dissertation"),
    ("repo", "masters paper", "dissertation"),
    ("repo", "masters thesis", "dissertation"),
    ("repo", "masterthesis", "dissertation"),
    ("repo", "monografische reihe", "book"),
    ("repo", "monograph", "book"),
    ("repo", "null", "other"),
    ("repo", "other", "other"),
    ("repo", "part of book or chapter of book", "book-chapter"),
    ("repo", "patent", "other"),
    ("repo", "peer reviewed", "article"),
    ("repo", "peer-review", "peer-review"),
    ("repo", "peerreviewed", "article"),
    ("repo", "phd", "dissertation"),
    ("repo", "phdthesis", "dissertation"),
    ("repo", "preprint", "preprint"),
    ("repo", "preprints, working papers, ...", "preprint"),
    ("repo", "presentation", "other"),
    ("repo", "publishedversion", "article"),
    ("repo", "report", "report"),
    ("repo", "reportpart", "report"),
    ("repo", "reports", "report"),
    ("repo", "research data", "dataset"),
    ("repo", "review", "review"),
    ("repo", "review article", "review"),
    ("repo", "software", "software"),
    ("repo", "submittedversion", "article"),
    ("repo", "technical documentation", "report"),
    ("repo", "technical report", "report"),
    ("repo", "tesi doctoral", "dissertation"),
    ("repo", "text", "article"),
    ("repo", "text (article)", "article"),
    ("repo", "theses", "dissertation"),
    ("repo", "thesis", "dissertation"),
    ("repo", "thesis or dissertation", "dissertation"),
    ("repo", "thesis-reproduction (electronic)", "dissertation"),
    ("repo", "thèse", "dissertation"),
    ("repo", "undergraduate senior honors thesis", "dissertation"),
    ("repo", "volume", "book"),
    ("repo", "vor", "article"),
    ("repo", "working paper", "report"),
    ("repo", "workingpaper", "report"),
    ("repo", "zeitschrift", "article"),
    ("datacite", "audiovisual", "other"),
    ("datacite", "award", "other"),
    ("datacite", "book", "book"),
    ("datacite", "bookchapter", "book-chapter"),
    ("datacite", "collection", "other"),
    ("datacite", "computationalnotebook", "software"),
    ("datacite", "conferencepaper", "conference-paper"),
    ("datacite", "conferenceproceeding", "conference-paper"),
    ("datacite", "datapaper", "data-paper"),
    ("datacite", "dataset", "dataset"),
    ("datacite", "dissertation", "dissertation"),
    ("datacite", "event", "other"),
    ("datacite", "image", "other"),
    ("datacite", "instrument", "other"),
    ("datacite", "interactiveresource", "other"),
    ("datacite", "journal", "other"),
    ("datacite", "journalarticle", "article"),
    ("datacite", "model", "dataset"),
    ("datacite", "modeloutput", "other"),
    ("datacite", "other", "other"),
    ("datacite", "peerreview", "peer-review"),
    ("datacite", "physicalobject", "other"),
    ("datacite", "poster", "conference-abstract"),
    ("datacite", "preprint", "preprint"),
    ("datacite", "projectreport", "report"),
    ("datacite", "report", "report"),
    ("datacite", "service", "other"),
    ("datacite", "software", "software"),
    ("datacite", "sound", "other"),
    ("datacite", "standard", "standard"),
    ("datacite", "studyregistration", "other"),
    ("datacite", "text", "article"),
    ("datacite", "workflow", "other"),
    ("datacite", "chapter", "book-chapter"),
    ("datacite", "thesis", "dissertation"),
    ("crossref", "book", "book"),
    ("crossref", "book-chapter", "book-chapter"),
    ("crossref", "book-part", "book-chapter"),
    ("crossref", "book-series", "paratext"),
    ("crossref", "book-set", "book"),
    ("crossref", "book-track", "book-chapter"),
    ("crossref", "dataset", "dataset"),
    ("crossref", "dissertation", "dissertation"),
    ("crossref", "edited-book", "book"),
    ("crossref", "journal", "paratext"),
    ("crossref", "journal-issue", "paratext"),
    ("crossref", "journal-volume", "paratext"),
    ("crossref", "monograph", "book"),
    ("crossref", "other", "other"),
    ("crossref", "peer-review", "peer-review"),
    ("crossref", "proceedings", "paratext"),
    ("crossref", "proceedings-series", "paratext"),
    ("crossref", "reference-book", "book"),
    ("crossref", "reference-entry", "reference-entry"),
    ("crossref", "report", "report"),
    ("crossref", "report-series", "paratext"),
    ("crossref", "standard", "standard"),
    ("pubmed", "address", "other"),
    ("pubmed", "autobiography", "other"),
    ("pubmed", "bibliography", "paratext"),
    ("pubmed", "biography", "other"),
    ("pubmed", "classical article", "other"),
    ("pubmed", "clinical conference", "other"),
    ("pubmed", "collected work", "other"),
    ("pubmed", "comment", "letter"),
    ("pubmed", "congress", "paratext"),
    ("pubmed", "consensus development conference", "other"),
    ("pubmed", "corrected and republished article", "erratum"),
    ("pubmed", "dataset", "dataset"),
    ("pubmed", "dictionary", "paratext"),
    ("pubmed", "directory", "paratext"),
    ("pubmed", "duplicate publication", "other"),
    ("pubmed", "editorial", "editorial"),
    ("pubmed", "electronic supplementary materials", "supplementary-materials"),
    ("pubmed", "english abstract", "other"),
    ("pubmed", "expression of concern", "other"),
    ("pubmed", "festschrift", "other"),
    ("pubmed", "government publication", "other"),
    ("pubmed", "guideline", "other"),
    ("pubmed", "historical article", "other"),
    ("pubmed", "interactive tutorial", "other"),
    ("pubmed", "interview", "other"),
    ("pubmed", "introductory journal article", "other"),
    ("pubmed", "lecture", "other"),
    ("pubmed", "legal case", "other"),
    ("pubmed", "legislation", "other"),
    ("pubmed", "letter", "letter"),
    ("pubmed", "meta-analysis", "review"),
    ("pubmed", "news", "other"),
    ("pubmed", "newspaper article", "other"),
    ("pubmed", "overall", "other"),
    ("pubmed", "patient education handout", "other"),
    ("pubmed", "peer review", "peer-review"),
    ("pubmed", "periodical index", "paratext"),
    ("pubmed", "personal narrative", "other"),
    ("pubmed", "portrait", "other"),
    ("pubmed", "practice guideline", "other"),
    ("pubmed", "preprint", "preprint"),
    ("pubmed", "published erratum", "erratum"),
    ("pubmed", "research support, american recovery and reinvestment act", "other"),
    ("pubmed", "research support, n.i.h., extramural", "other"),
    ("pubmed", "research support, n.i.h., intramural", "other"),
    ("pubmed", "research support, non-u.s. gov't", "other"),
    ("pubmed", "research support, u.s. gov't, non-p.h.s.", "other"),
    ("pubmed", "research support, u.s. gov't, p.h.s.", "other"),
    ("pubmed", "retracted publication", "retraction"),
    ("pubmed", "retraction of publication", "retraction"),
    ("pubmed", "review", "review"),
    ("pubmed", "scientific integrity review", "review"),
    ("pubmed", "systematic review", "review"),
    ("pubmed", "technical report", "report"),
    ("pubmed", "video-audio media", "other"),
    ("pubmed", "webcast", "other"),
]

assert len(DICT_MAP) == 221, len(DICT_MAP)
