"""Changed-rows data feed (the Wunpaywall feed shape).

The reference ships a daily/weekly "changed DOIs" feed
(``notebooks/end2end/WunpaywallDataFeed.py``): read the last-run
watermark from a metadata table, select only rows whose
``updated_date`` passed it, refuse to ship an implausibly large batch
unless an operator overrides, land ONE dated ``changed_*_<window>.jsonl``
file, append an export-metadata row (file name/path/bytes/line count/
window), and advance the watermark.  Re-expressed here without the
Databricks plumbing: watermark + metadata live as JSON/JSONL files next
to the feed output (any fsspec-style path), timestamps are explicit
arguments (``now``) so runs are reproducible and testable, and the
single-file land uses coalesce(1) + rename exactly like the reference's
copy step.

Scale: the only full-scan work is the watermark filter + count; with
``updated_col`` as a partition column the filter prunes at the source
(the incremental-scan discipline, sources/files.py).  The coalesce(1)
is a feed-contract requirement (consumers poll one file per window) —
the reference makes the same trade and sizes the batch with the safety
cap for exactly that reason.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame

_MIN_WATERMARK = "0001-01-01"


class FeedSafetyError(RuntimeError):
    """Batch exceeds the safety cap and no override was given."""


@dataclass
class FeedResult:
    shipped: int
    file_name: str | None
    file_path: str | None
    file_bytes: int
    from_watermark: str
    to_watermark: str


def _read_watermark(state_dir: str, default: str) -> str:
    p = os.path.join(state_dir, "watermark.json")
    if not os.path.exists(p):
        return default
    with open(p) as fh:
        return json.load(fh)["watermark"]


def _write_watermark(state_dir: str, value: str) -> None:
    with open(os.path.join(state_dir, "watermark.json"), "w") as fh:
        json.dump({"watermark": value}, fh)


def export_changed_rows(
    docs: DataFrame,
    updated_col: str,
    state_dir: str,
    now: str,
    name: str = "changed_rows",
    safety_cap: int = 1_500_000,
    override: bool = False,
    min_watermark: str = _MIN_WATERMARK,
) -> FeedResult:
    """Ship one feed batch: rows of ``docs`` (a one-column ``doc`` frame
    from ``to_json_docs`` plus the ``updated_col``) with
    ``updated_col > watermark`` land as a single dated JSONL file.

    Contract mirrored from the reference:
    - only CHANGED rows ship (the watermark filter is the gate; pair it
      with D9 hash-diff upstream so touched-but-identical rows carry
      their old updated_date and never enter the window),
    - a batch larger than ``safety_cap`` raises :class:`FeedSafetyError`
      unless ``override`` (the reference's widget),
    - zero changed rows = no file, no watermark advance (the reference
      exits early),
    - on success: metadata line appended to ``export_metadata.jsonl``
      and the watermark advances to ``now``.
    """
    os.makedirs(state_dir, exist_ok=True)
    frm = _read_watermark(state_dir, min_watermark)
    from pyspark.sql import functions as F

    changed = docs.where(F.col(updated_col) > F.lit(frm))
    n = changed.count()
    if n > safety_cap and not override:
        raise FeedSafetyError(
            f"{n} changed rows exceed the safety cap {safety_cap}; "
            "pass override=True to ship anyway"
        )
    if n == 0:
        return FeedResult(0, None, None, 0, frm, frm)

    window = f"{frm.replace(':', '').replace(' ', 'T')}_to_{now.replace(':', '').replace(' ', 'T')}"
    file_name = f"{name}_{window}.jsonl"
    tmp = os.path.join(state_dir, f"_tmp_{name}")
    changed.select("doc").coalesce(1).write.mode("overwrite").text(tmp)
    part = next(
        f for f in sorted(os.listdir(tmp))
        if f.startswith("part-") and not f.endswith(".crc")
    )
    final_path = os.path.join(state_dir, file_name)
    shutil.move(os.path.join(tmp, part), final_path)
    shutil.rmtree(tmp)

    meta = {
        "export_timestamp": now,
        "file_name": file_name,
        "file_path": final_path,
        "file_size_bytes": os.path.getsize(final_path),
        "line_count": n,
        "from_watermark": frm,
        "to_watermark": now,
    }
    with open(os.path.join(state_dir, "export_metadata.jsonl"), "a") as fh:
        fh.write(json.dumps(meta, sort_keys=True) + "\n")
    _write_watermark(state_dir, now)
    return FeedResult(n, file_name, final_path, meta["file_size_bytes"], frm, now)
