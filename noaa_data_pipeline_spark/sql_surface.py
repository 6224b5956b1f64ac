"""Ad-hoc SQL surface (SURVEY §3.3, M5).

The reference ships duckdb-wasm in the browser and runs arbitrary
user SQL over the two parquet tables (ui/main.js:112-141), with an
acknowledged TODO to restrict to SELECT (:130-131). Here: temp views
over the lake + ``spark.sql`` behind an actual SELECT-only guard,
plus the schema introspection the UI derives from Arrow metadata
(ui/main.js:143-159).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORBIDDEN_KEYWORDS = {
    "insert", "update", "delete", "merge", "drop", "create", "alter",
    "truncate", "grant", "revoke", "set", "refresh", "cache", "uncache",
    "analyze", "msck", "load", "call",
}


class SqlGuardError(ValueError):
    pass


def _strip_comments(sql: str) -> str:
    import re

    sql = re.sub(r"--[^\n]*", " ", sql)
    sql = re.sub(r"/\*.*?\*/", " ", sql, flags=re.S)
    return sql


def validate_select_only(sql: str) -> None:
    """Reject anything but a single SELECT/WITH query. Token-level
    check on the comment-stripped text: statement must start with
    SELECT/WITH/VALUES, contain no statement separator, and no DML/
    DDL keyword anywhere (conservative: a SELECT mentioning 'update'
    as a bare word is rejected rather than risk a bypass)."""
    import re

    cleaned = _strip_comments(sql).strip().rstrip(";").strip()
    if not cleaned:
        raise SqlGuardError("empty query")
    if ";" in cleaned:
        raise SqlGuardError("multiple statements are not allowed")
    first = re.split(r"\s+", cleaned, maxsplit=1)[0].lower()
    if first not in {"select", "with", "values", "table", "explain"}:
        raise SqlGuardError(f"only read queries are allowed (got '{first}')")
    tokens = set(re.findall(r"[a-zA-Z_]+", cleaned.lower()))
    hit = tokens & FORBIDDEN_KEYWORDS
    if hit:
        raise SqlGuardError(f"forbidden keyword(s): {sorted(hit)}")


def run_user_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Execute guarded ad-hoc SQL against the registered views."""
    validate_select_only(sql)
    return spark.sql(sql)


def table_schemas(spark: SparkSession, tables: list[str]) -> dict[str, list[dict[str, str]]]:
    """The UI's schema introspection: column name/type per view."""
    out: dict[str, list[dict[str, str]]] = {}
    for t in tables:
        out[t] = [
            {"column_name": f.name, "column_type": f.dataType.simpleString()}
            for f in spark.table(t).schema.fields
        ]
    return out
