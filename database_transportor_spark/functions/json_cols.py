"""Semi-structured (JSON string) column extraction, Spark-first.

Event streams and CDC feeds carry loosely-typed JSON payloads (the
fixture's ``events.props``).  The scalable extraction shape is ONE
``from_json`` parse per row against a pinned schema — each
``get_json_object`` call re-parses the whole document, so extracting N
fields that way costs N parses (and N regex-ish scans) per row, which at
100 TB is the difference between one codegen'd pass and N.

``infer_json_schema`` pins the schema from a bounded driver-side sample
(never a full scan); production jobs should persist the inferred DDL and
pass it explicitly, so a late malformed record cannot silently change
column types between runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructField, StructType, _parse_datatype_string

__all__ = ["json_extract_columns", "infer_json_schema"]


def _schema_from_paths(fields: dict[str, tuple[str, str]]) -> StructType:
    """Build the minimal nested StructType covering every requested dot
    path (``a.b.c``), so one ``from_json`` parses exactly what's needed
    (column pruning for JSON: unrequested keys are never materialized)."""
    root: dict = {}
    for _, (path, dtype) in fields.items():
        parts = path.split(".")
        node = root
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                raise ValueError(
                    f"json_extract_columns: path {path!r} descends through "
                    f"leaf field {p!r}"
                )
            node = nxt
        leaf = parts[-1]
        if isinstance(node.get(leaf), dict):
            raise ValueError(
                f"json_extract_columns: leaf {path!r} collides with a "
                "nested path"
            )
        t = _parse_datatype_string(dtype)
        if leaf in node and node[leaf] != t:
            # silently letting the last spec win would make the earlier
            # output extract through the wrong type (all-NULL, no error)
            raise ValueError(
                f"json_extract_columns: path {path!r} requested with "
                f"conflicting types {node[leaf].simpleString()!r} and "
                f"{t.simpleString()!r}"
            )
        node[leaf] = t

    def build(d: dict) -> StructType:
        out = []
        for k, v in d.items():
            t: DataType = build(v) if isinstance(v, dict) else v
            out.append(StructField(k, t, True))
        return StructType(out)

    return build(root)


def json_extract_columns(
    df: DataFrame,
    json_col: str,
    fields: dict[str, tuple[str, str] | str],
    parsed_alias: str = "__j",
) -> DataFrame:
    """Extract typed columns from a JSON-string column in ONE parse.

    ``fields``: ``{out_name: (dot_path, spark_type_ddl)}``, or
    ``{out_name: spark_type_ddl}`` shorthand when the path equals the
    output name.  Dot paths address nested objects (``"meta.device.os"``);
    arrays should be typed as ``array<...>`` at their path.  Missing keys
    and type mismatches yield NULL (``from_json`` semantics — the
    JSON-ingestion contract), never an error mid-pipeline.

    Scale shape: one ``from_json`` against the minimal schema covering
    the requested paths, then pure struct-field projections — a single
    whole-stage-codegen pass, no Python, no per-field re-parse.
    """
    norm: dict[str, tuple[str, str]] = {}
    for out, spec in fields.items():
        norm[out] = (out, spec) if isinstance(spec, str) else (spec[0], spec[1])
    schema = _schema_from_paths(norm)
    reserved = set(df.columns)
    if parsed_alias in reserved:
        raise ValueError(f"json_extract_columns reserves column {parsed_alias!r}")
    clashes = sorted(set(norm) & reserved)
    if clashes:
        # a duplicate-named output column would surface later as an
        # AMBIGUOUS_REFERENCE far from this call — fail here instead
        raise ValueError(
            f"json_extract_columns: output names {clashes} already exist "
            "on the input; alias them differently"
        )
    parsed = df.withColumn(parsed_alias, F.from_json(F.col(json_col), schema))
    cols: list[Column] = [F.col(c) for c in df.columns]
    for out, (path, _) in norm.items():
        cols.append(F.col(f"{parsed_alias}.{path}").alias(out))
    return parsed.select(*cols)


def infer_json_schema(
    df: DataFrame,
    json_col: str,
    sample_rows: int = 1000,
) -> str:
    """Infer a JSON schema DDL from a bounded sample of the column — a
    driver-side ``take`` (never a full scan) fed to Spark's own JSON
    schema inference.  Returns the DDL string to pin in the job config;
    at 100 TB infer once, review, and hard-code — inference drift is a
    silent-typing bug, not a feature."""
    sample = [
        r[0] for r in df.select(json_col).limit(sample_rows).collect()
        if r[0] is not None
    ]
    if not sample:
        raise ValueError(f"infer_json_schema: no non-null rows in {json_col!r}")
    rdd = df.sparkSession.sparkContext.parallelize(sample)
    inferred = df.sparkSession.read.json(rdd).schema
    return inferred.simpleString()
