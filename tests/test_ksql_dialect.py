"""Run the reference tutorial's KSQL statements through the engine's
dialect front-end and assert the README's golden outputs.

Statement shapes mirror /root/reference/files/ksqldb-cli/all.sql and
README.md (cited per block); data is the FIXTURES.md §A scenario.
"""

from __future__ import annotations

import json

import pytest

from ksql_query_tutorial_spark import tutorial
from ksql_query_tutorial_spark.ksql.engine import print_topic
from ksql_query_tutorial_spark.session import EngineSession


@pytest.fixture()
def eng(spark):
    e = EngineSession(spark)
    # SET + source DDL (all.sql:1, 20-43)
    e.ksql("SET 'auto.offset.reset' = 'earliest';")
    e.ksql("""
        CREATE TABLE players (
          id VARCHAR PRIMARY KEY,
          name VARCHAR(50),
          team VARCHAR(50),
          nationality VARCHAR(50)
        ) WITH (KAFKA_TOPIC = 'players', VALUE_FORMAT = 'JSON', PARTITIONS = 1);
    """)
    e.ksql("""
        CREATE STREAM match_event (
          id VARCHAR KEY,
          event_type VARCHAR,
          player_id VARCHAR,
          home BOOLEAN
        ) WITH (KAFKA_TOPIC = 'match_event', VALUE_FORMAT = 'JSON', PARTITIONS = 1);
    """)
    # seed players (the reference seeds via MySQL CDC, init.sql:11-22)
    for r in tutorial.PLAYERS_ROWS:
        e.ksql(
            "INSERT INTO players (id, name, team, nationality) VALUES "
            f"('{r['id']}', '{r['name']}', '{r['team']}', '{r['nationality']}');"
        )
    # CSAS re-key (all.sql:45-51)
    e.ksql("""
        CREATE STREAM match_event_player
        WITH (KAFKA_TOPIC = 'match_event_player', VALUE_FORMAT = 'JSON', PARTITIONS = 1)
        AS SELECT id AS match_id, event_type, player_id, __offset
        FROM match_event PARTITION BY player_id;
    """)
    return e


def insert_events(e, rows):
    for r in rows:
        e.ksql(
            "INSERT INTO match_event (id, event_type, player_id, home) VALUES "
            f"('{r['id']}', '{r['event_type']}', '{r['player_id']}', {str(r['home']).lower()});"
        )


def test_table_scan_golden(eng):
    """SELECT * FROM players EMIT CHANGES (README.md:97, golden 100-114)."""
    df = eng.ksql("SELECT * FROM players EMIT CHANGES;")
    rows = {r.id: (r.name, r.team, r.nationality) for r in df.collect()}
    assert len(rows) == 10
    assert rows["1"] == ("Lionel Messi", "Paris Saint-Germain", "Argentinian")
    assert rows["10"] == ("Raheem Sterling", "Chelsea", "English")


def test_table_upsert_on_rekey(eng):
    """Upsert semantics (README.md:92): same PRIMARY KEY → update."""
    eng.ksql("INSERT INTO players (id, name, team, nationality) VALUES "
             "('1', 'Lionel Messi', 'Inter Miami', 'Argentinian');")
    rows = {r.id: r.team for r in eng.ksql("SELECT * FROM players;").collect()}
    assert len(rows) == 10 and rows["1"] == "Inter Miami"


def test_projection_ucase_case_filters(eng):
    """UCASE (README.md:128-133), CASE (136-148), WHERE (150-163)."""
    up = eng.ksql("SELECT id, UCASE(team) team FROM players EMIT CHANGES;")
    assert {r.team for r in up.collect() if r.id == "1"} == {"PARIS SAINT-GERMAIN"}
    case = eng.ksql("""
        SELECT id, name,
          CASE WHEN nationality = 'Portuguese' THEN 'POR' ELSE 'OTHER' END AS tag
        FROM players EMIT CHANGES;
    """)
    tags = {r.id: r.tag for r in case.collect()}
    assert tags["2"] == "POR" and tags["9"] == "POR" and tags["1"] == "OTHER"
    filt = eng.ksql(
        "SELECT name FROM players WHERE team = 'Paris Saint-Germain' "
        "AND nationality = 'Brazilian' EMIT CHANGES;")
    assert [r.name for r in filt.collect()] == ["Neymar Jr."]


def test_stream_filter_golden(eng):
    """WHERE event_type='ASSIST' on the stream (README.md:216-226)."""
    insert_events(eng, tutorial.MATCH_EVENT_ROWS[:2])
    df = eng.ksql("SELECT * FROM match_event WHERE event_type = 'ASSIST' EMIT CHANGES;")
    rows = df.collect()
    assert len(rows) == 1 and rows[0].player_id == "1" and rows[0].home is True


def test_match_results_ctas_golden(eng):
    """CTAS match_results (README.md:308-327) + sink layout (333-351)."""
    insert_events(eng, tutorial.MATCH_EVENT_ROWS)
    eng.ksql("""
        CREATE TABLE match_results
        WITH (KAFKA_TOPIC = 'match_results', VALUE_FORMAT = 'JSON', PARTITIONS = 1)
        AS SELECT id,
             SUM(CASE WHEN event_type = 'GOAL' AND home THEN 1 ELSE 0 END) AS home_goals,
             SUM(CASE WHEN event_type = 'GOAL' AND NOT home THEN 1 ELSE 0 END) AS away_goals
        FROM match_event GROUP BY id EMIT CHANGES;
    """)
    res = {r.id: (r.home_goals, r.away_goals)
           for r in eng.ksql("SELECT * FROM match_results;").collect()}
    assert res == {"1": (2, 1), "2": (1, 1)}
    kv = {r.key: json.loads(r.value) for r in print_topic(eng, "match_results").collect()}
    assert kv["1"] == {"HOME_GOALS": 2, "AWAY_GOALS": 1}   # README.md:348-351
    assert kv["2"] == {"HOME_GOALS": 1, "AWAY_GOALS": 1}


def test_player_stats_ctas_golden(eng):
    """player_stats CTAS with LATEST_BY_OFFSET, COUNT_DISTINCT, CAST
    (all.sql:129-160); golden README.md:413-420."""
    insert_events(eng, tutorial.MATCH_EVENT_ROWS)
    eng.ksql("""
        CREATE TABLE player_stats
        WITH (KAFKA_TOPIC = 'player_stats', VALUE_FORMAT = 'JSON', PARTITIONS = 1)
        AS SELECT p.id AS player_id,
             LATEST_BY_OFFSET(p.name) AS name,
             SUM(CASE WHEN m.event_type = 'GOAL' THEN 1 ELSE 0 END) AS goals,
             CAST(SUM(CASE WHEN m.event_type = 'GOAL' THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT_DISTINCT(m.match_id) AS DOUBLE) AS avg_goals,
             SUM(CASE WHEN m.event_type = 'ASSIST' THEN 1 ELSE 0 END) AS assists
        FROM match_event_player m
        INNER JOIN players p ON m.player_id = p.id
        GROUP BY p.id EMIT CHANGES;
    """)
    stats = {r.player_id: (r.name, r.goals, r.avg_goals, r.assists)
             for r in eng.ksql("SELECT * FROM player_stats;").collect()}
    assert stats["1"] == ("Lionel Messi", 3, 1.5, 1)
    assert stats["2"] == ("Cristiano Ronaldo", 2, 1.0, 1)


def test_composite_key_sink_layout(eng):
    """README's grouped-by-3-columns variant → composite JSON key
    (README.md:454, 461-465)."""
    insert_events(eng, tutorial.MATCH_EVENT_ROWS)
    eng.ksql("""
        CREATE TABLE player_goals
        WITH (KAFKA_TOPIC = 'player_goals', VALUE_FORMAT = 'JSON', PARTITIONS = 1)
        AS SELECT p.id AS player_id, p.name AS name, p.nationality AS nationality,
             SUM(CASE WHEN m.event_type = 'GOAL' THEN 1 ELSE 0 END) AS goals
        FROM match_event_player m
        INNER JOIN players p ON m.player_id = p.id
        GROUP BY p.id, p.name, p.nationality EMIT CHANGES;
    """)
    keys = {r.key for r in print_topic(eng, "player_goals").collect()}
    assert '{"PLAYER_ID":"1","NAME":"Lionel Messi","NATIONALITY":"Argentinian"}' in keys


def test_admin_surface(eng):
    """SHOW TOPICS/STREAMS/TABLES/CONNECTORS (README.md:64-72, §2.7)."""
    assert "players" in eng.ksql("SHOW TOPICS;")
    assert "match_event" in eng.show_streams()
    assert "players" in eng.show_tables()
    eng.ksql("""
        CREATE SOURCE CONNECTOR players_source WITH (
          'connector.class' = 'io.confluent.connect.jdbc.JdbcSourceConnector',
          'connection.url' = 'jdbc:mysql://mysql:3306/football',
          'mode' = 'incrementing',
          'incrementing.column.name' = 'id'
        );
    """)
    assert "players_source" in eng.ksql("SHOW CONNECTORS;")


def test_verbatim_all_sql_runs_end_to_end(spark):
    """The reference's actual script (files/ksqldb-cli/all.sql) verbatim:
    14 of 15 statements execute (the 15th selects non-aggregated columns
    grouped only by p.id — ksqlDB 0.15 rejects it too, which is why the
    CTAS wraps them in LATEST_BY_OFFSET), the connector snapshot seeds
    players from the reference's MySQL init.sql, and player_stats ends
    with the correct aggregate state for all.sql's 4-insert sequence."""
    from ksql_query_tutorial_spark.ksql import dialect, engine

    sess = EngineSession(spark)
    text = open("/root/reference/files/ksqldb-cli/all.sql").read()
    ok, failures = 0, []
    for s in dialect.split_statements(text):
        try:
            engine.execute(sess, s)
            ok += 1
        except Exception as e:
            failures.append(str(e))
    assert ok == 14 and len(failures) == 1
    assert "MISSING_AGGREGATION" in failures[0]

    got = {
        r.player_id: (r.player_name, r.goals, r.avg_goals, r.assists)
        for r in spark.table("player_stats").collect()
    }
    assert got == {
        "1": ("Lionel Messi", 1, 0.5, 2),
        "2": ("Cristiano Ronaldo", 1, 1.0, 0),
    }


def test_cli_runs_scripts(spark, tmp_path, capsys):
    """The CLI module executes a script, prints SELECT results, and
    propagates a nonzero exit code for failed statements."""
    from ksql_query_tutorial_spark.ksql.cli import main

    script = tmp_path / "s.sql"
    script.write_text(
        "CREATE STREAM ev (id VARCHAR KEY, v VARCHAR) "
        "WITH (KAFKA_TOPIC='ev', VALUE_FORMAT='JSON', PARTITIONS=1);\n"
        "INSERT INTO ev VALUES ('1', 'hello');\n"
        "SELECT * FROM ev EMIT CHANGES;\n"
    )
    rc = main([str(script), "--cpus", "4"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "hello" in out

    bad = tmp_path / "bad.sql"
    bad.write_text("SELECT definitely_not_a_column FROM nowhere;")
    assert main([str(bad), "--cpus", "4"]) == 1


def test_scalar_function_surface_extensions(eng):
    """ksqlDB function rewrites beyond the tutorial's UCASE/CASE:
    LEN, MASK (X/x/n/- masking), EARLIEST_BY_OFFSET, TOPK."""
    out = eng.ksql(
        "SELECT id, LEN(name) n, MASK(name) m FROM players EMIT CHANGES;"
    )
    rows = {r.id: r for r in out.collect()}
    assert rows["1"].n == len("Lionel Messi")
    assert rows["1"].m == "Xxxxxx-Xxxxx"       # 'Lionel Messi' masked
    early = eng.ksql(
        "SELECT nationality, EARLIEST_BY_OFFSET(name) first_seen "
        "FROM players GROUP BY nationality EMIT CHANGES;"
    )
    got = {r.nationality: r.first_seen for r in early.collect()}
    assert got["Portuguese"] == "Cristiano Ronaldo"   # offset 1 < offset 8
    topk = eng.ksql(
        "SELECT nationality, TOPK(name, 2) top2 FROM players "
        "GROUP BY nationality EMIT CHANGES;"
    )
    t = {r.nationality: list(r.top2) for r in topk.collect()}
    # two Portuguese players: lexicographically descending top-2
    assert t["Portuguese"] == sorted(t["Portuguese"], reverse=True)
    assert len(t["Portuguese"]) == 2


def test_windowed_aggregations_via_ksql_syntax(spark):
    """ksqlDB WINDOW TUMBLING / HOPPING / SESSION syntax end-to-end:
    the dialect rewrites to Spark window()/session_window() grouped on
    the collection's declared TIMESTAMP column, with WINDOWSTART /
    WINDOWEND pseudo-columns."""
    import pytest as _pytest

    from ksql_query_tutorial_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.ksql("""
        CREATE STREAM clicks (ts TIMESTAMP, user_id BIGINT)
        WITH (KAFKA_TOPIC='clicks', VALUE_FORMAT='JSON', PARTITIONS=1,
              TIMESTAMP='ts');
    """)
    for t, u in [("2024-01-01 00:00:10", 1), ("2024-01-01 00:00:40", 2),
                 ("2024-01-01 00:01:10", 1), ("2024-01-01 00:03:30", 3)]:
        eng.ksql(
            f"INSERT INTO clicks (ts, user_id) VALUES ('{t}', {u});"
        )

    tum = eng.ksql("""
        SELECT WINDOWSTART ws, COUNT(*) n FROM clicks
        WINDOW TUMBLING (SIZE 1 MINUTES) GROUP BY 1 EMIT CHANGES;
    """)
    got = {str(r.ws): r.n for r in tum.collect()}
    assert got == {"2024-01-01 00:00:00": 2, "2024-01-01 00:01:00": 1,
                   "2024-01-01 00:03:00": 1}

    hop = eng.ksql("""
        SELECT WINDOWSTART ws, COUNT(*) n FROM clicks
        WINDOW HOPPING (SIZE 2 MINUTES, ADVANCE BY 1 MINUTES)
        GROUP BY 1 EMIT CHANGES;
    """)
    rows = {str(r.ws): r.n for r in hop.collect()}
    # the 00:00-02:00 hop covers the first three events
    assert rows["2024-01-01 00:00:00"] == 3

    sess = eng.ksql("""
        SELECT user_id, WINDOWSTART ws, WINDOWEND we, COUNT(*) n
        FROM clicks WINDOW SESSION (45 SECONDS)
        GROUP BY user_id EMIT CHANGES;
    """)
    per_user = {}
    for r in sess.collect():
        per_user.setdefault(r.user_id, []).append(r.n)
    # user 1's two events are 60s apart: > 45s gap -> two sessions
    assert sorted(per_user[1]) == [1, 1]
    assert per_user[2] == [1] and per_user[3] == [1]

    # a windowed query against a source with NO declared timestamp
    # fails with the actionable message, not a Spark analysis error
    eng.ksql("""
        CREATE STREAM nots (v BIGINT)
        WITH (KAFKA_TOPIC='nots', VALUE_FORMAT='JSON', PARTITIONS=1);
    """)
    with _pytest.raises(ValueError, match="TIMESTAMP"):
        eng.ksql("SELECT COUNT(*) c FROM nots WINDOW TUMBLING "
                 "(SIZE 1 MINUTES) GROUP BY v EMIT CHANGES;")


def test_within_join_via_ksql_syntax(spark):
    """ksqlDB `JOIN ... WITHIN n U ON ...`: rewritten to the explicit
    time-range join condition over both sides' declared TIMESTAMP
    columns — same semantics as streaming interval_join."""
    import pytest as _pytest

    from ksql_query_tutorial_spark.session import EngineSession

    eng = EngineSession(spark)
    for nm in ("impressions", "clicks2"):
        eng.ksql(f"""
            CREATE STREAM {nm} (ts TIMESTAMP, user_id BIGINT)
            WITH (KAFKA_TOPIC='{nm}', VALUE_FORMAT='JSON', PARTITIONS=1,
                  TIMESTAMP='ts');
        """)
    eng.ksql("INSERT INTO impressions (ts, user_id) VALUES ('2024-01-01 00:00:00', 1);")
    eng.ksql("INSERT INTO impressions (ts, user_id) VALUES ('2024-01-01 01:00:00', 2);")
    eng.ksql("INSERT INTO clicks2 (ts, user_id) VALUES ('2024-01-01 00:10:00', 1);")  # in window
    eng.ksql("INSERT INTO clicks2 (ts, user_id) VALUES ('2024-01-01 02:30:00', 2);")  # out (90 min)

    out = eng.ksql("""
        SELECT i.user_id, i.ts its, c.ts cts
        FROM impressions i JOIN clicks2 c WITHIN 30 MINUTES
        ON i.user_id = c.user_id EMIT CHANGES;
    """).collect()
    assert len(out) == 1 and out[0].user_id == 1

    # both sides need event time
    eng.ksql("""
        CREATE STREAM nots2 (user_id BIGINT)
        WITH (KAFKA_TOPIC='nots2', VALUE_FORMAT='JSON', PARTITIONS=1);
    """)
    with _pytest.raises(ValueError, match="BOTH"):
        eng.ksql("SELECT * FROM impressions i JOIN nots2 n WITHIN 1 HOURS "
                 "ON i.user_id = n.user_id EMIT CHANGES;")


def test_ansi_passthrough_surface(eng):
    """The KSQL clauses that ARE Spark SQL already — HAVING, BETWEEN,
    LIKE, IN, CASE in WHERE — pass through the dialect unchanged and
    produce correct results (pinning the no-rewrite contract)."""
    hav = eng.ksql("""
        SELECT nationality, COUNT(*) n FROM players
        GROUP BY nationality HAVING COUNT(*) > 1 EMIT CHANGES;
    """).collect()
    assert all(r.n > 1 for r in hav) and len(hav) >= 1
    like = eng.ksql(
        "SELECT name FROM players WHERE name LIKE 'L%' EMIT CHANGES;"
    ).collect()
    assert {r.name for r in like} >= {"Lionel Messi"}
    inq = eng.ksql("""
        SELECT COUNT(*) n FROM players
        WHERE nationality IN ('Portuguese', 'Brazilian') EMIT CHANGES;
    """).collect()
    assert inq[0].n >= 3
    btw = eng.ksql(
        "SELECT COUNT(*) n FROM players WHERE id BETWEEN '1' AND '3' "
        "EMIT CHANGES;"
    ).collect()
    # VARCHAR ids compare lexicographically: '1', '10', '2', '3'
    assert btw[0].n == 4


def test_describe_and_explain(eng):
    """DESCRIBE lists fields with key markers; DESCRIBE EXTENDED adds
    the metadata block; EXPLAIN returns the engine's physical plan for
    a rewritten SELECT."""
    out = eng.ksql("DESCRIBE players;")
    assert any(line.startswith("ID | ") and "(key)" in line for line in out)
    assert any(line.startswith("NAME | STRING") for line in out)

    ext = eng.ksql("DESCRIBE EXTENDED players;")
    assert any(line.startswith("Type: TABLE") for line in ext)
    assert any(line.startswith("Value format:") for line in ext)
    assert any(line.startswith("ID | ") for line in ext)

    plan = eng.ksql("EXPLAIN SELECT UCASE(name) AS n FROM players;")
    # the fixture registers players as an in-memory view, so the plan
    # shows the relation, not a file scan — pin structure + rewrite
    assert "== Physical Plan ==" in plan
    assert "upper" in plan.lower()        # UCASE rewritten to upper()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        eng.ksql("DESCRIBE no_such_thing;")
    with _pytest.raises(ValueError):
        eng.ksql("EXPLAIN DROP TABLE players;")
