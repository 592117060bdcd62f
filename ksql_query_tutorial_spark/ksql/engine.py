"""KSQL statement executor: run the reference tutorial's statements
against the engine.

Execution model: collections are registered temp views over in-memory
"topics" (ordered record lists with an ``__offset`` pseudo-column — the
stand-in for Kafka topics in this broker-less container). The
relational semantics match the reference:

- a ``TABLE``'s view is its upsert state (latest record per PRIMARY
  KEY, `README.md:92`); a ``STREAM``'s view is every record.
- ``INSERT INTO`` appends to the topic at the next offset (S6).
- CSAS/CTAS register the rewritten SELECT as a composable view (the
  Catalyst-native form of a derived collection) plus catalog metadata
  carrying the sink key columns; ``print_topic`` renders any collection
  in the sink wire layout (key/value JSON — the console-consumer S7
  analog, `README.md:333-351`).
- push queries (``SELECT ... EMIT CHANGES``) return the current result
  state as a DataFrame; continuous execution of the same plans is the
  streaming layer (ksql_query_tutorial_spark.streaming) — identical
  logical plans via stream/batch unification.

Statement coverage = the reference's surface: SET, CREATE SOURCE
CONNECTOR, CREATE TABLE/STREAM (source + AS SELECT), INSERT INTO,
SELECT, SHOW TOPICS/STREAMS/TABLES/CONNECTORS/QUERIES, DESCRIBE
[EXTENDED], EXPLAIN, TERMINATE, DROP.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ksql_query_tutorial_spark.functions.serde import encode_kv
from ksql_query_tutorial_spark.ksql import dialect
from ksql_query_tutorial_spark.session import Collection


def _ensure_state(session) -> None:
    if not hasattr(session, "topics"):
        session.topics = {}          # topic -> list[dict] (ordered records)
        session.properties = {}      # SET'd session properties
        session.connectors = {}      # name -> props
        session.derived = {}         # CSAS/CTAS name -> rewritten SQL (creation order)


def execute(session, text: str) -> Any:
    """Execute one statement or a whole script; returns the last
    statement's result (DataFrame for SELECTs, metadata otherwise)."""
    _ensure_state(session)
    result: Any = None
    for stmt in dialect.split_statements(text):
        result = _execute_one(session, stmt)
    return result


def _execute_one(session, stmt: str) -> Any:
    head = stmt.split(None, 2)[0].upper() if stmt.split() else ""
    if head == "SET":
        m = re.match(r"SET\s+'([^']+)'\s*=\s*'([^']*)'", stmt, re.I)
        if not m:
            raise ValueError(f"cannot parse SET: {stmt!r}")
        session.properties[m.group(1)] = m.group(2)
        return session.properties

    if re.match(r"CREATE\s+(SOURCE\s+|SINK\s+)?CONNECTOR", stmt, re.I):
        m = re.match(
            r"CREATE\s+(?:SOURCE|SINK)?\s*CONNECTOR\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            r"[`\"]?(\w+)[`\"]?\s+WITH\s*\((.*)\)\s*$",
            stmt, re.I | re.S,
        )
        if not m:
            raise ValueError(f"cannot parse CREATE CONNECTOR: {stmt!r}")
        name, props = m.group(1), dialect.parse_with_props(m.group(2))
        session.connectors[name] = props
        # The incrementing-JDBC ingest adapter is sources.jdbc.
        # IncrementingIngest; without a database in this container the
        # connector's initial snapshot is simulated from the reference's
        # own MySQL seed (files/mysql/init.sql:11-22) when the tutorial's
        # football.players source is declared — the topic is auto-named
        # after the table (README.md:68), keys stringified per the
        # StringConverter (all.sql:15).
        whitelist = props.get("table.whitelist", "")
        if whitelist == "players" and "football" in props.get("connection.url", ""):
            from ksql_query_tutorial_spark.tutorial import PLAYERS_ROWS

            prefix = props.get("topic.prefix", "")
            topic = session.topics.setdefault(f"{prefix}{whitelist}", [])
            if not topic:
                topic.extend(dict(r, __offset=i) for i, r in enumerate(PLAYERS_ROWS))
        return {name: props}

    m = re.match(
        r"CREATE\s+(TABLE|STREAM)\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*"
        r"(?:\((?P<defs>.*?)\)\s*)?WITH\s*\((?P<props>.*?)\)\s*(?:AS\s+(?P<select>SELECT\b.*))?$",
        stmt, re.I | re.S,
    )
    if m:
        kind, name = m.group(1).upper(), m.group(2).lower()
        props = dialect.parse_with_props(m.group("props") or "")
        if m.group("select"):
            return _create_as_select(session, kind, name, props, m.group("select"))
        return _create_source_collection(session, kind, name, m.group("defs") or "", props)

    if re.match(r"INSERT\s+INTO", stmt, re.I):
        return _insert_into(session, stmt)

    if head == "SELECT":
        sql, _ = dialect.rewrite_select(
            stmt, ts_col=_ts_col_of(session, stmt),
            ts_of=lambda t: _ts_prop(session, t))
        return session.spark.sql(sql)

    if head == "SHOW":
        return _show(session, stmt)

    if head == "DESCRIBE":
        return _describe(session, stmt)

    if head == "EXPLAIN":
        return _explain(session, stmt)

    if head == "TERMINATE":
        session.terminate(stmt.split()[1])
        return None

    if head == "DROP":
        m = re.match(r"DROP\s+(TABLE|STREAM)\s+(?:IF\s+EXISTS\s+)?(\w+)", stmt, re.I)
        if m:
            name = m.group(2).lower()
            session.catalog.pop(name, None)
            session.spark.catalog.dropTempView(name)
            return None

    raise ValueError(f"unsupported statement: {stmt[:80]!r}")


# ----------------------------------------------------------------- helpers

def _create_source_collection(session, kind: str, name: str, defs: str,
                              props: dict[str, str]) -> Collection:
    cols, key_cols, _ = dialect.parse_column_defs(defs)
    topic = props.get("kafka_topic", name)
    session.topics.setdefault(topic, [])
    coll = Collection(
        name=name, kind=kind, key_cols=tuple(key_cols),
        value_format=props.get("value_format", "JSON").upper(),
        partitions=int(props.get("partitions", "1")), topic=topic,
        properties={**props, "columns": ",".join(f"{c}:{t}" for c, t in cols)},
    )
    session.catalog[name] = coll
    _refresh_view(session, coll)
    return coll


def _schema_ddl(coll: Collection) -> str:
    cols = coll.properties["columns"].split(",")
    return ", ".join(f"{c.split(':')[0]} {c.split(':')[1]}" for c in cols) + ", __offset BIGINT"


def _refresh_view(session, coll: Collection) -> None:
    """(Re)register the collection's temp view from its topic records."""
    rows = session.topics.get(coll.topic, [])
    spark = session.spark
    schema = _schema_ddl(coll)
    # coerce TIMESTAMP-typed columns: INSERT VALUES carries them as
    # ISO strings (ksqlDB's literal form); createDataFrame wants
    # datetimes
    ts_cols = {
        c.split(":")[0]
        for c in coll.properties["columns"].split(",")
        if c and c.split(":")[1].upper() == "TIMESTAMP"
    }
    if rows and ts_cols:
        from datetime import datetime

        def fix(r):
            return {
                k: (datetime.fromisoformat(v)
                    if k in ts_cols and isinstance(v, str) else v)
                for k, v in r.items()
            }

        rows = [fix(r) for r in rows]
    if rows:
        df = spark.createDataFrame([tuple(r.values()) for r in rows], schema=schema)
    else:
        df = spark.createDataFrame([], schema=schema)
    if coll.kind == "TABLE" and coll.key_cols:
        from ksql_query_tutorial_spark.operators.upsert import latest_by_key

        df = latest_by_key(df, list(coll.key_cols), "__offset")
    df.createOrReplaceTempView(coll.name)


def _insert_into(session, stmt: str) -> None:
    m = re.match(
        r"INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\)\s*)?VALUES\s*\((.*)\)\s*$",
        stmt, re.I | re.S,
    )
    if not m:
        raise ValueError(f"cannot parse INSERT: {stmt!r}")
    name = m.group(1).lower()
    coll = session.catalog[name]
    declared = [c.split(":")[0] for c in coll.properties["columns"].split(",")]
    # column list omitted (all.sql:53-54): values bind to the declared
    # columns in DDL order, key column included
    cols = ([c.strip().lower() for c in m.group(2).split(",")]
            if m.group(2) else declared)
    values = _parse_values(m.group(3))
    row = dict.fromkeys(declared)
    row.update(dict(zip(cols, values)))
    topic = session.topics[coll.topic]
    row["__offset"] = len(topic)
    topic.append(row)
    _refresh_view(session, coll)
    # a source-collection insert must flow through derived collections
    # (the continuous-maintenance contract, `README.md:205,310`): temp
    # views capture the RESOLVED plan at registration, so re-register
    # every CSAS/CTAS in creation order against the refreshed sources.
    for dname, dsql in session.derived.items():
        session.spark.sql(dsql).createOrReplaceTempView(dname)


def _parse_values(s: str) -> list[Any]:
    out: list[Any] = []
    # '((?:[^']|'')*)' handles KSQL's doubled-quote escape ('N''Golo')
    pat = re.compile(r"'((?:[^']|'')*)'|(true|false)|(-?\d+\.\d+)|(-?\d+)|(NULL)", re.I)
    for m in pat.finditer(s):
        if m.group(1) is not None:
            out.append(m.group(1).replace("''", "'"))
        elif m.group(2) is not None:
            out.append(m.group(2).lower() == "true")
        elif m.group(3) is not None:
            out.append(float(m.group(3)))
        elif m.group(4) is not None:
            out.append(int(m.group(4)))
        else:
            out.append(None)
    return out


def _ts_prop(session, table: str) -> str | None:
    coll = session.catalog.get(table)
    return coll.properties.get("timestamp") if coll else None


def _ts_col_of(session, sql: str) -> str | None:
    """The FROM collection's declared event-time column (WITH
    (TIMESTAMP='col')) — required by windowed queries, unused
    otherwise."""
    tbl = dialect.from_table(sql)
    return _ts_prop(session, tbl) if tbl else None


def _create_as_select(session, kind: str, name: str, props: dict[str, str],
                      select: str) -> Collection:
    sql, partition_by = dialect.rewrite_select(
        select, ts_col=_ts_col_of(session, select),
        ts_of=lambda t: _ts_prop(session, t))
    # A non-aggregated CSAS writes a real topic, so its records carry
    # their own offsets; downstream LATEST_BY_OFFSET over the derived
    # stream (all.sql:136-137 reads match_event_player) needs them.
    # At the reference's PARTITIONS=1 the sink offsets follow source
    # arrival order — propagate the source's __offset. (Single-relation
    # CSAS only: with a join the unqualified column would be ambiguous,
    # and the reference never joins in a CSAS.)
    if (kind == "STREAM"
            and not re.search(r"\bGROUP\s+BY\b", sql, re.I)
            and not re.search(r"\bJOIN\b", sql, re.I)
            and "__offset" not in sql):
        sql = re.sub(r"^(\s*SELECT\s+)(.*?)(\s+FROM\s)",
                     lambda m: m.group(1) + m.group(2) + ", __offset" + m.group(3),
                     sql, count=1, flags=re.I | re.S)
    df = session.spark.sql(sql)
    df.createOrReplaceTempView(name)
    key_cols: tuple[str, ...]
    if partition_by:
        key_cols = (partition_by.split(".")[-1].lower(),)
    elif kind == "TABLE":
        gb = re.search(r"GROUP\s+BY\s+(.+?)(?:$)", sql, re.I | re.S)
        key_cols = tuple(
            c.strip().split(".")[-1].lower() for c in gb.group(1).split(",")
        ) if gb else ()
    else:
        key_cols = ()
    coll = Collection(
        name=name, kind=kind, key_cols=key_cols,
        value_format=props.get("value_format", "JSON").upper(),
        partitions=int(props.get("partitions", "1")),
        topic=props.get("kafka_topic", name),
        properties={**props, "query": sql},
    )
    session.catalog[name] = coll
    session.topics.setdefault(coll.topic, [])
    session.derived[name] = sql
    return coll


def _show(session, stmt: str) -> list[str]:
    what = stmt.split()[1].rstrip(";").upper()
    if what == "TOPICS":
        return sorted(session.topics)
    if what == "STREAMS":
        return session.show_streams()
    if what == "TABLES":
        return session.show_tables()
    if what == "CONNECTORS":
        return sorted(session.connectors)
    if what == "QUERIES":
        return session.show_queries()
    raise ValueError(f"unsupported SHOW: {stmt!r}")


def _describe(session, stmt: str) -> list[str]:
    """``DESCRIBE [EXTENDED] name;`` — the ksqlDB field/type listing
    (ksqlDB CLI's DESCRIBE output table), EXTENDED adding the
    collection metadata block (kind, key, format, topic, partitions,
    running queries against it)."""
    m = re.match(r"DESCRIBE\s+(EXTENDED\s+)?(\w+)\s*;?\s*$", stmt, re.I)
    if not m:
        raise ValueError(f"unsupported DESCRIBE: {stmt!r}")
    extended, name = bool(m.group(1)), m.group(2).lower()
    if name not in session.catalog:
        raise ValueError(f"unknown stream/table: {name}")
    coll = session.catalog[name]
    fields = [
        f"{f.name.upper()} | {f.dataType.simpleString().upper()}"
        + (" (key)" if f.name in coll.key_cols else "")
        for f in session.spark.table(name).schema.fields
    ]
    if not extended:
        return fields
    queries = [
        q for q in getattr(session, "persistent_queries", {})
        if q == name or q.endswith(name)
    ]
    meta = [
        f"Name: {coll.name.upper()}",
        f"Type: {coll.kind}",
        f"Key columns: {', '.join(c.upper() for c in coll.key_cols) or '-'}",
        f"Value format: {coll.value_format}",
        f"Kafka topic: {coll.topic or '-'} (partitions: {coll.partitions})",
        f"Queries that write from this {coll.kind}: "
        + (', '.join(queries) or '-'),
    ]
    return meta + fields


def _explain(session, stmt: str) -> str:
    """``EXPLAIN <select>;`` — the optimized/physical plan for a push
    or pull query (ksqlDB's EXPLAIN analog, rendered as Spark's
    formatted plan, which is this engine's execution plan)."""
    body = re.sub(r"^EXPLAIN\s+", "", stmt.strip(), flags=re.I)
    if not re.match(r"SELECT\b", body, re.I):
        raise ValueError(f"EXPLAIN expects a SELECT, got: {body[:60]!r}")
    sql, _ = dialect.rewrite_select(
        body, ts_col=_ts_col_of(session, body),
        ts_of=lambda t: _ts_prop(session, t))
    df = session.spark.sql(sql)
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def print_topic(session, name: str) -> DataFrame:
    """Render a collection in the sink wire layout: (key, value) JSON —
    the console-consumer analog (`README.md:333-351`, `461-464`).

    Key columns resolve from the catalog; aggregate-alias key columns
    (e.g. grouped ``p.id`` projected as ``player_id``) use the view's
    columns by suffix match.
    """
    coll = session.catalog[name]
    df = session.spark.table(name)
    keys = [k for k in coll.key_cols]
    resolved = []
    for k in keys:
        if k in df.columns:
            resolved.append(k)
        else:  # grouped column projected under an alias: match by suffix
            cand = [c for c in df.columns if c.endswith(k) or k.endswith(c)]
            resolved.append(cand[0] if cand else df.columns[0])
    value_cols = [c for c in df.columns if c not in resolved and c != "__offset"]
    return encode_kv(df.drop("__offset") if "__offset" in df.columns else df,
                     resolved, value_cols)
