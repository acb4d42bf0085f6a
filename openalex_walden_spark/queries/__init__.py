"""Query catalog: every SURVEY.md §2 operator as an oracle-checked query.

Each entry pairs an idiomatic-Spark implementation (DataFrame API / Spark
SQL over the driver's test tables) with an equivalent ANSI-SQL oracle for
DuckDB. The registry backs ``__spark_entry__.queries()`` /
``oracle_sql()`` and the local parity test-suite.
"""

from openalex_walden_spark.queries.registry import CATALOG, QuerySpec, register  # noqa: F401

# Module names imported by load_all(); extend as catalog modules land.
_MODULES = ("relational", "windows", "walden", "llmdata", "events", "textops", "advanced", "domain2", "nested", "sqludf", "scalarbattery", "typerules", "d6cascade", "timeseries", "sketches", "graphops", "layout", "overmerge", "paywall", "metatags", "maintenance", "aer", "topicsprep", "metrics", "scrapeops", "enrichmerge", "judgeops", "authorship", "unpaywall", "locsources", "superauth", "authornames", "workawards", "ingestxref", "curations", "rorsync", "loccurations", "rascounts", "authorembed", "sourcessnap", "pdfawards", "sourcesapi", "funderimpact", "essync", "namefix", "affmatch", "guardops", "awardregistry", "funderscrape", "usaspending", "isvavai", "swecris", "fris", "nihrparse", "bmbfparse", "arcparse", "lakebase", "twasparse", "bhfparse", "ccparse", "isciiiparse", "awardtopics", "sshrcparse", "rgchk", "blueplanet", "sloanparse", "dreyfusparse", "searleparse", "threesixty", "threesixtyrich", "potterparse", "tinyfunder", "method5", "prizepattern", "foundationarchive", "microfunder", "wprest", "fellowdir", "anrparse", "nhmrcparse", "nsfparse", "publishersapi", "keywordsapi", "pcaarrd", "rfbr", "mjff", "carlsberg", "mmw", "holbergparse",
    "lettenparse", "hiltonparse", "telethonparse", "vilcekparse",
    "nuffieldparse", "acmedsciparse", "laskerparse", "cureepilepsy",
    "ssfparse", "keckparse", "warrenalpert", "pchrdparse", "nomisparse",
    "heinekenparse", "cifarparse", "kauffmanparse", "laureateprize")


def load_all() -> None:
    """Import every catalog module so registrations run."""
    import importlib

    for mod in _MODULES:
        importlib.import_module(f"openalex_walden_spark.queries.{mod}")
