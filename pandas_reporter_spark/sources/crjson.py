"""CR-JSON → wide CensusFrame pivot (S3) + materializers (S4-S6).

Recovered contract (reference censusreporter.py:178-282):

- column codes sorted; codes containing '.' are section headers, not
  data columns — skipped (`:219`)
- titles via an indent stack: the stack grows/shrinks to the column's
  indent, slot `indent` gets the name with ':' stripped, title = the
  joined stack (`:221-242`)
- each estimate column is immediately followed by its `<code>_m90`
  margin ("Margins for …" names), positions interleaved (`:244-253`)
- geoid + geography name lead every row; single-column tables return
  scalars from itemgetter — re-wrapped as lists (`:269-273`)
- row order = iteration order of data keys; release dict rides along

The pivot itself is driver-side (one API response is a few hundred
rows × a few hundred columns — metadata scale, not data scale); the
result is immediately a distributed DataFrame. Bulk ingest of MANY
responses would `spark.read.json` the cache dir and run this same
shaping as explode/pivot expressions; that variant only matters once
responses stop fitting a driver heartbeat.
"""

from __future__ import annotations

from operator import itemgetter
from typing import Optional, Tuple

from pyspark.sql import SparkSession
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from pandas_reporter_spark.frame import CensusFrame
from pandas_reporter_spark.sources.url import CensusReporterURL, fetch_json


def _lead_col(name: str, position: int) -> dict:
    return {
        "name": name,
        "code": name,
        "title": name,
        "code_title": name,
        "indent": 0,
        "index": "   ",
        "position": position,
    }


def cr_columns(data: dict, table_id: str) -> list[dict]:
    """Seven-key column metadata list: geoid, name, then per sorted
    code an (estimate, margin) pair."""
    columns = [_lead_col("geoid", 0), _lead_col("name", 1)]
    title_stack: list[str] = []
    table_cols = data["tables"][table_id]["columns"]
    column_codes = sorted(c for c in table_cols if "." not in c)
    for code in column_codes:
        name = table_cols[code]["name"]
        indent = table_cols[code]["indent"]
        index = code[-3:]
        if len(title_stack) <= indent:
            title_stack.extend([""] * (indent - len(title_stack) + 1))
        else:
            title_stack = title_stack[: indent + 1]
        title_stack[indent] = name.replace(":", "")
        title = " ".join(title_stack)
        columns.append(
            {
                "name": name,
                "title": title,
                "code": code,
                "code_title": f"{code} {title}",
                "indent": indent,
                "index": index,
                "position": len(columns),
            }
        )
        columns.append(
            {
                "name": f"Margins for {name}",
                "title": f"Margins for {title}",
                "code": f"{code}_m90",
                "code_title": f"Margins for {code} {title}",
                "indent": indent,
                "index": index,
                "position": len(columns),
            }
        )
    return columns


def cr_rows(data: dict, table_id: str) -> Tuple[list[list], list[dict], dict]:
    """(rows, columns, release) — the reference's get_cr_rows."""
    columns = cr_columns(data, table_id)
    column_codes = [
        c["code"] for c in columns[2:] if not c["code"].endswith("_m90")
    ]
    row_ig = itemgetter(*column_codes)
    rows = []
    for geo in data["data"]:
        row = [geo, data["geography"][geo]["name"]]
        ests = row_ig(data["data"][geo][table_id]["estimate"])
        errs = row_ig(data["data"][geo][table_id]["error"])
        if not isinstance(ests, (list, tuple)):  # single-column table
            ests = [ests]
        if not isinstance(errs, (list, tuple)):
            errs = [errs]
        for e, m in zip(ests, errs):
            row.append(None if e is None else float(e))
            row.append(None if m is None else float(m))
        rows.append(row)
    assert len(rows) == 0 or len(columns) == len(rows[0])
    return rows, columns, data.get("release", {})


def cr_frame(spark: SparkSession, data: dict, table_id: str) -> CensusFrame:
    """S5: materialize the pivot as a CensusFrame with explicit schema
    (schema-from-API is built BEFORE createDataFrame — SURVEY §1.4)."""
    rows, columns, release = cr_rows(data, table_id)
    fields = [
        StructField(
            c["code"], StringType() if c["position"] < 2 else DoubleType(), True
        )
        for c in columns
    ]
    df = spark.createDataFrame(rows, StructType(fields))
    out = CensusFrame(df, release=release)
    out.meta = {c["code"]: c for c in columns}
    return out


def cr_row_generator(data: dict, table_id: str):
    """S4: the reference's row-generator protocol — header then rows."""
    rows, columns, _ = cr_rows(data, table_id)
    yield [c["code"] for c in columns]
    yield from rows


def get_cr_dataframe(
    spark: SparkSession,
    table_id: str,
    summary_level: str,
    geoid: str,
    cache_dir: Optional[str] = None,
    fetcher=None,
) -> CensusFrame:
    """S6: url → fetch (cache/fixture) → pivot → CensusFrame."""
    u = CensusReporterURL(f"censusreporter:{table_id}/{summary_level}/{geoid}")
    data = fetch_json(u, cache_dir=cache_dir, fetcher=fetcher)
    return cr_frame(spark, data, table_id)
