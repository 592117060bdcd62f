"""Benchmark harness (driver contract).

Runs every declared query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": N, "unit": "sec", "queries":
{name: sec}, "sf": ...}``.

Each query is forced with a result-consuming checksum aggregate
(``sum(xxhash64(all output columns))``): unlike the pre-r7 ``count()``
action, Catalyst cannot prune the projected expressions away, so
projection-only queries (q02/q03/q04/q19) actually evaluate their
UPPER/CASE/concat expressions instead of degenerating to scan+count
(VERDICT r6 #2). The checksum collapses to a single driver-side row,
so there is still no driver-side materialization of result data.

``python bench.py --calibrate`` additionally reruns 10 fixed
sub-second queries N times and prints a per-host noise line (per-query
coefficient of variation); the normal run embeds the same line in the
compact summary so regression claims can be gated on movers exceeding
the measured noise floor (VERDICT r6 #6).

Noise gate (VERDICT r8 #2): calibration brackets the timing passes —
once before, once after. If BOTH brackets exceed the documented
thresholds (cv_median > 0.25 or cv_max > 0.5) the output JSON is
stamped ``"noisy": true``, marking the totals as weak cross-round
evidence; the calmer bracket is recorded as the headline calibration.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Fixed sub-second calibration set: cheap, plan-stable tutorial queries
# spanning scan / projection / filter / agg / join shapes. Their spread
# across repeats measures host noise, not plan changes.
CALIBRATION_QUERIES = [
    "q01_full_scan", "q02_projection", "q03_ucase", "q04_case_when",
    "q05_eq_filter", "q06_conj_filter", "q08_not_null",
    "q09_group_count", "q13_latest_by_offset", "q14_inner_join",
]
CALIBRATION_REPS = 5

# VERDICT r8 #1/#2: a bench recorded in a noisy window (r8: cv_max
# 1.247 vs the calm-window precedent ~0.2) is weak cross-round
# evidence. Calibration now runs BEFORE the timing passes as well as
# after; if BOTH windows exceed these thresholds the output is stamped
# "noisy": true so the round-over-round compare knows to discount the
# totals (the driver runs bench exactly once, so refusing to emit JSON
# would lose the round's numbers entirely — loud annotation is the
# honest alternative the verdict allows).
CV_MEDIAN_MAX = 0.25
CV_MAX_MAX = 0.50


def _force(df) -> int:
    """Execute the full plan and consume every output column.

    ``sum(pmod(xxhash64(cols), 2^31))`` reads every column of every
    result row, so no projected expression can be pruned; pmod bounds
    each term so the ANSI-mode sum cannot overflow below ~2^32 rows.
    Map columns (none today) would be stringified since xxhash64
    rejects MapType.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import MapType

    cols = [
        F.to_json(F.col(f.name)) if isinstance(f.dataType, MapType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    row = df.select(
        F.sum(F.pmod(F.xxhash64(*cols), F.lit(2 ** 31))).alias("chk"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return int(row["n"])


def main() -> None:
    calibrate_only = "--calibrate" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from ksql_query_tutorial_spark.session import get_spark

    spark = get_spark(app_name="ksql-tutorial-bench", cpus=cpus)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Warm the JVM so per-query numbers measure the plan, not
    # first-touch cost: scan every table at the target sf (parquet
    # footer cache), then run every query once at the smallest sf.
    # Generated-code classes are keyed by source text, which depends on
    # the plan shape but not the input path — so the tiny-sf pass
    # populates the codegen compile cache, C2-JITs the hot loops, and
    # spins up the Arrow Python worker pool for the exact UDFs the
    # timed pass runs.
    from ksql_query_tutorial_spark.tables import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).count()

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    warm_names = CALIBRATION_QUERIES if calibrate_only else sorted(qs)
    for name in warm_names:
        try:
            _force(qs[name](spark, warm_dir))
        except Exception:
            pass
    spark.catalog.clearCache()

    timings: dict[str, float] = {}

    def timed(name: str, tag: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = _force(df)
        elapsed = round(time.perf_counter() - t0, 4)
        timings[name] = min(timings.get(name, elapsed), elapsed)
        print(f"# {tag} {name}: {elapsed:.3f}s rows={n}", file=sys.stderr)
        # each query stands alone: operators that persist intermediates
        # must not leak cache blocks (and GC pressure) into later timings
        spark.catalog.clearCache()
        return elapsed

    def calibration() -> dict[str, float]:
        """Per-host noise floor: CV (stdev/mean) of repeated runs of
        fixed sub-second queries. Movers below ~3x the median CV in a
        round-over-round compare are host noise, not regressions."""
        samples: dict[str, list[float]] = {q: [] for q in CALIBRATION_QUERIES}
        for _rep in range(CALIBRATION_REPS):
            for q in CALIBRATION_QUERIES:
                t0 = time.perf_counter()
                _force(qs[q](spark, sf_dir))
                samples[q].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        cvs = {
            q: round(statistics.stdev(v) / statistics.mean(v), 4)
            for q, v in samples.items()
        }
        return {
            "cv_median": round(statistics.median(cvs.values()), 4),
            "cv_max": round(max(cvs.values()), 4),
            "reps": CALIBRATION_REPS,
        }

    def is_noisy(c: dict[str, float] | None) -> bool:
        return c is None or c["cv_median"] > CV_MEDIAN_MAX or c["cv_max"] > CV_MAX_MAX

    if calibrate_only:
        cal = calibration()
        print(json.dumps({
            "metric": "bench_noise_calibration", **cal,
            "noisy": is_noisy(cal),
        }))
        return

    # Pre-pass calibration: measure the window BEFORE committing three
    # timing passes to it, so a sustained-noise window is detected even
    # if the host calms down by the closing calibration.
    try:
        cal_pre: dict[str, float] | None = calibration()
        print(f"# calibration(pre): {cal_pre}", file=sys.stderr)
    except Exception as exc:  # pragma: no cover - host-dependent
        print(f"# pre-calibration failed: {exc!r}", file=sys.stderr)
        cal_pre = None

    # THREE full passes: on a contended host even best-of-2 records
    # multi-x-inflated numbers when a sustained noisy window covers a
    # query's both slots (measured on this host: the same query 3.6s
    # and 38s minutes apart; one run had 12 untouched sub-second
    # queries all >=2x high because a noisy stretch covered their
    # alphabetical neighborhood in both passes). A third pass minutes
    # later breaks that correlation for ~3 extra minutes of runtime.
    for _pass in range(3):
        for name in sorted(qs):
            timed(name, f"pass{_pass}")
        # between passes, release dead localCheckpoint blocks (iterative
        # operators pin them until a JVM GC lets ContextCleaner run —
        # measured 2.4x repeat-run degradation at sf1 without this);
        # outside any timed region.
        spark.sparkContext._jvm.System.gc()

    # Extra pass over the slowest tail only: the tail is where absolute
    # noise dominates the headline total, so every multi-second query
    # gets a fourth sample. Threshold-based (not a fixed top-N) so the
    # promise holds as the query set grows (ADVICE r6).
    tail = [k for k, v in timings.items() if v > 1.0]
    for name in sorted(tail):
        timed(name, "pass3-tail")

    # ADVICE r7: a calibration failure must not cost the three timing
    # passes already completed — emit calibration=null instead.
    try:
        cal_post: dict[str, float] | None = calibration()
        print(f"# calibration(post): {cal_post}", file=sys.stderr)
    except Exception as exc:  # pragma: no cover - host-dependent
        print(f"# calibration failed: {exc!r}", file=sys.stderr)
        cal_post = None

    # The run is noisy only if BOTH calibration windows exceeded the
    # documented thresholds (a single noisy bracket with a calm other
    # side means the best-of-4 per-query minima very likely landed in
    # the calm stretch). Record the calmer window as the headline
    # calibration plus the verdict flag.
    candidates = [c for c in (cal_pre, cal_post) if c is not None]
    cal = (
        min(candidates, key=lambda c: (c["cv_median"], c["cv_max"]))
        if candidates else None
    )
    noisy = is_noisy(cal_pre) and is_noisy(cal_post)
    if noisy:
        print("# WARNING: noisy window — totals are weak cross-round "
              "evidence (see README bench rules)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "calibration": cal,
                "calibration_pre": cal_pre,
                "calibration_post": cal_post,
                "noisy": noisy,
            }
        )
    )
    # The driver records only the LAST 2KB of stdout; with 200+ queries
    # the full per-query dict above exceeds that, so its single line
    # gets decapitated and parses as nothing (BENCH_r05.json
    # "parsed": null — VERDICT r5 #5).
    #
    # VERDICT r9 #2b (measurement-visibility fix, not a methodology
    # change — the timed numbers above are untouched): additionally
    # emit the per-query map as MANY self-contained sub-700-byte
    # "per_query_chunk" JSON lines, sorted by query name, immediately
    # before the final compact summary. Rationale: a 2KB tail can only
    # ever hold ~45 per-query entries, so chunking cannot make ALL of
    # them survive — but sorted order makes the SAME trailing ~45
    # queries survive in every round, giving any tail-reading comparer
    # a stable common subset instead of one decapitated unparseable
    # line. The full map is also written to bench_logs/bench_latest.json
    # (documented file artifact; overwritten per run) for anything that
    # can read files.
    try:
        _logdir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_logs"
        )
        os.makedirs(_logdir, exist_ok=True)
        with open(os.path.join(_logdir, "bench_latest.json"), "w") as fh:
            json.dump(
                {
                    "metric": "total_query_wall_clock",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf_val,
                    "cpus": cpus,
                    "calibration": cal,
                    "noisy": noisy,
                },
                fh,
            )
    except OSError as exc:  # pragma: no cover - read-only checkout etc.
        print(f"# bench_latest.json not written: {exc!r}", file=sys.stderr)

    chunk: dict[str, float] = {}
    chunks: list[dict[str, float]] = []
    for name in sorted(timings):
        chunk[name] = timings[name]
        # ~25 bytes/entry: 24 entries keeps every line well under 700B
        if len(chunk) == 24:
            chunks.append(chunk)
            chunk = {}
    if chunk:
        chunks.append(chunk)
    for i, c in enumerate(chunks):
        print(
            json.dumps(
                {
                    "metric": "per_query_chunk",
                    "part": i + 1,
                    "of": len(chunks),
                    "queries": c,
                }
            )
        )

    # Emit a compact, guaranteed-sub-2KB summary line LAST so the tail
    # always contains one parseable record: totals plus the 10 slowest
    # queries.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf_val,
                "slowest": slowest,
                "calibration": cal,
                "noisy": noisy,
            }
        )
    )


if __name__ == "__main__":
    main()
