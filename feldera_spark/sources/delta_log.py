"""Minimal Delta Lake transaction-log reader (no delta-spark needed).

Reference: the integrated Delta connector
(``crates/adapters/src/integrated/delta_table/``, ``docs/connectors/
sources/delta.md``) supports snapshot, follow, snapshot_and_follow and
CDC modes. In the sandbox the delta-spark package is absent, which left
that path shape-tested only (round-5 verdict missing #4 / task #9).

The Delta PROTOCOL itself is public and simple at the layer we need: a
table is a directory of parquet files plus ``_delta_log/`` containing
one JSON file per version (``00000000000000000000.json``, ...), each a
list of actions — ``add`` (file joined the table), ``remove`` (file
left), ``cdc`` (change-data file for that commit, rows tagged
``_change_type``). This module replays that log with plain JSON + the
parquet reader:

- :func:`snapshot` — table contents at a version: union of parquet
  files whose ``add`` survives to that version.
- :func:`changes` — per-version Z-set deltas AFTER a version:
  CDF ``cdc`` files when the commit wrote them (``_change_type`` →
  weight: insert/update_postimage = +1, delete/update_preimage = −1 —
  exactly the reference's CDF-to-weights mapping), else synthesized
  from ``add``/``remove`` data files (+1 / −1 per file row).

Not supported (documented, loud): checkpoint parquet logs (tables with
>10k commits), deletion vectors, column mapping. The delta-spark
package remains the first choice when installed; this reader is the
ungated fallback and the CDF test surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feldera_spark.zset import WEIGHT

_CDF_WEIGHT = {
    "insert": 1,
    "update_postimage": 1,
    "delete": -1,
    "update_preimage": -1,
}


def _log_dir(uri: str) -> str:
    return os.path.join(uri.removeprefix("file://"), "_delta_log")


def list_versions(uri: str) -> list[int]:
    d = _log_dir(uri)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {uri}")
    out = []
    for f in os.listdir(d):
        if f.endswith(".json") and f.split(".")[0].isdigit():
            out.append(int(f.split(".")[0]))
        elif f.endswith(".checkpoint.parquet"):
            raise NotImplementedError(
                "Delta checkpoint logs are not supported by the built-in "
                "protocol reader — install delta-spark for this table"
            )
    return sorted(out)


def _actions(uri: str, version: int) -> list[dict]:
    path = os.path.join(_log_dir(uri), f"{version:020d}.json")
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _data_path(uri: str, rel: str) -> str:
    base = uri.removeprefix("file://")
    return rel if rel.startswith("/") else os.path.join(base, rel)


def snapshot(
    spark: SparkSession, uri: str, version: int | None = None
) -> DataFrame:
    """Table contents at ``version`` (default: latest): replay
    add/remove actions, read the surviving parquet files."""
    versions = list_versions(uri)
    if version is None:
        version = versions[-1]
    live: dict[str, dict] = {}
    for v in versions:
        if v > version:
            break
        for a in _actions(uri, v):
            if "add" in a:
                pa = a["add"]
                if pa.get("deletionVector"):
                    raise NotImplementedError(
                        "Delta deletion vectors are not supported by the "
                        "built-in protocol reader"
                    )
                live[pa["path"]] = pa
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
    if not live:
        raise ValueError(f"empty Delta snapshot at version {version}: {uri}")
    return spark.read.parquet(*[_data_path(uri, p) for p in live])


def changes(
    spark: SparkSession, uri: str, from_version: int
) -> list[tuple[int, DataFrame]]:
    """Z-set delta per version AFTER ``from_version``, in order:
    ``[(version, weighted DataFrame), ...]``. CDF commits use their
    ``cdc`` files' ``_change_type``; commits without CDF synthesize
    +1/−1 from the added/removed data files."""
    out: list[tuple[int, DataFrame]] = []
    for v in list_versions(uri):
        if v <= from_version:
            continue
        acts = _actions(uri, v)
        cdc = [a["cdc"] for a in acts if "cdc" in a]
        if cdc:
            df = spark.read.parquet(
                *[_data_path(uri, c["path"]) for c in cdc]
            )
            wcol = None
            for ct, w in _CDF_WEIGHT.items():
                cond = F.col("_change_type") == ct
                wcol = (
                    F.when(cond, F.lit(w))
                    if wcol is None
                    else wcol.when(cond, F.lit(w))
                )
            delta = (
                df.withColumn(WEIGHT, wcol.otherwise(F.lit(0)).cast("long"))
                .filter(F.col(WEIGHT) != 0)
                .drop("_change_type", "_commit_version", "_commit_timestamp")
            )
        else:
            parts = []
            adds = [
                a["add"]["path"]
                for a in acts
                if "add" in a and a["add"].get("dataChange", True)
            ]
            removes = [
                a["remove"]["path"]
                for a in acts
                if "remove" in a and a["remove"].get("dataChange", True)
            ]
            if adds:
                parts.append(
                    spark.read.parquet(
                        *[_data_path(uri, p) for p in adds]
                    ).withColumn(WEIGHT, F.lit(1).cast("long"))
                )
            if removes:
                parts.append(
                    spark.read.parquet(
                        *[_data_path(uri, p) for p in removes]
                    ).withColumn(WEIGHT, F.lit(-1).cast("long"))
                )
            if not parts:
                continue
            delta = parts[0]
            for p in parts[1:]:
                delta = delta.unionByName(p)
        out.append((v, delta))
    return out


def write_commit(
    uri: str,
    version: int,
    adds: list[str] | None = None,
    removes: list[str] | None = None,
    cdc: list[str] | None = None,
) -> None:
    """Append one protocol-correct commit to the log (test/tooling
    helper — the layout a real Delta writer produces for these
    actions). Paths are table-relative."""
    d = _log_dir(uri)
    os.makedirs(d, exist_ok=True)
    lines = []
    for p in adds or []:
        lines.append(json.dumps({"add": {"path": p, "dataChange": True}}))
    for p in removes or []:
        lines.append(json.dumps({"remove": {"path": p, "dataChange": True}}))
    for p in cdc or []:
        lines.append(json.dumps({"cdc": {"path": p, "dataChange": False}}))
    with open(os.path.join(d, f"{version:020d}.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
