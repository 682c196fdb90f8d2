"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.

Output contract (VERDICT r6 #2 — the driver tail-captures stdout and
parses the LAST line): the FINAL stdout line is the COMPACT summary
{"metric", "value", "unit", "sf", "queries", "queries_clean",
"value_clean", "contended", "idle_remeasure"} and nothing else; the
bulky detail (per-query run arrays, the parity block) goes to stderr,
where the driver's round log keeps it without risking the tail window.

Each query runs one untimed warm-up then 3 timed runs (best-of-3); a
strictly-falling timed sequence extends to best-of-5, and a query still
strictly falling at 5 is flagged in the JSON's "contended" list — its
minimum is a known overestimate, not a plan cost. At the END of an
attempt (once the host is at its quietest) a query is RE-measured (3
extra timed runs, minimum ships in "idle_remeasure") if it was
contended this attempt (VERDICT r10 #6 — every contaminated line
re-times itself), OR its best-of run came out >25% slower than the
previous round's recorded value at the SAME sf (VERDICT r7 #3 — a
host-drift round must prove or refute the environmental story inside
the artifact itself). "queries_clean" / "value_clean" carry
min(best-of, idle re-measure) per query.

HEADLINE CONVENTION (VERDICT r11 #3): the recorded headline must be a
FULLY-IDLE attempt — no contention flags, and every idle re-measure
CONFIRMING its as-measured value (see _attempt_is_idle: a quiet re-run
that merely confirms a slower-than-prev number is a real plan cost,
not dirt) — not a contaminated attempt post-corrected. The measurement
series therefore retries the whole query loop (bounded at
_MAX_ATTEMPTS) until an attempt comes back clean; the compact summary
ships THAT attempt's numbers, with "attempts_run" / "headline_attempt"
recording the series and every attempt's detail on stderr for the
contention narrative. If no attempt is fully idle on a drifting host,
the one with the lowest corrected total ships, self-labelled
("headline_source": "min_clean_of_contended").

PARITY SURVIVABILITY (VERDICT r11 #4): the freshness-parity block used
to ride only the bulky stderr detail line, which the driver's tail
capture can cut mid-JSON. The compact stdout summary now carries a
"parity" sub-object (notification p50/p99, staleness p99, observed
stale fraction vs ceiling, in-band verdicts) and the same compact line
prints to stderr AFTER the bulky detail, so the headline parity fields
survive any tail window.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from proteus_spark import registry  # noqa: E402
from proteus_spark.session import build_session  # noqa: E402

HEADLINE = [
    "ref_lobsters_topk",
    "ref_join_merge",
    "ref_sum_view",
    "ref_topk_orders",
    "ref_range_filter",
    "ref_index_range",
    "ref_router_union",
]


# Bounded fully-idle retry (VERDICT r11 #3): 3 attempts x ~21 queries is
# well inside the driver's budget, and the round-11 series showed an idle
# window recurs within a couple of attempts even on an oscillating host.
_MAX_ATTEMPTS = 3
# Total wall-clock budget: the retry loop must never push the whole run
# past what the driver (or a supervising timeout) allows — a killed bench
# records NOTHING, strictly worse than a contended-labelled attempt. A
# new attempt only launches if the elapsed time plus the slowest attempt
# so far still fits. Override via SPARK_GRAFT_BENCH_BUDGET (seconds).
_BENCH_BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "450"))
# The driver stores/parses the LAST ~2000 chars of combined output; a
# stdout summary longer than that window decapitates and parses null
# (the round-6 artifact's exact failure). Cap with margin and degrade
# gracefully (see main) instead of ever exceeding it.
_MAX_SUMMARY_CHARS = 1900


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="proteus_spark_bench", cores=cpus)
    # Session warm-up: JVM + parquet reader + codegen class-loading, NOT
    # query work — reads a 5-row table from the smallest SF dir (not the
    # bench dir) so no benchmark input is pre-touched.
    spark.range(1).count()
    warm = "/root/testdata/sf0.001/region.parquet"
    if os.path.exists(warm) and warm not in sf_dir:
        spark.read.parquet(warm).count()

    fns = registry.all_queries()
    names = [n for n in HEADLINE if n in fns]
    # include any registered benchmark-tagged queries beyond the headline
    for n, spec in sorted(registry.QUERIES.items()):
        if "bench" in spec.tags and n not in names:
            names.append(n)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    prev = _previous_round_bench()
    attempts: list[dict] = []
    parity: dict = {}
    probe_waited = 0.0
    # cross-attempt probe memory (ADVICE r13): a canary adjudicated as a
    # reproduced plan cost stays dropped for every later attempt's probe.
    # last_obs, by contrast, resets PER ATTEMPT (review r14 #3): carrying
    # it across the ~2-minute measurement gap would let a later attempt's
    # FIRST pass "confirm" a noisy reading against a stale quiet one —
    # adjudication must always take two same-attempt passes 8s apart.
    plan_cost_canaries: set[str] = set()
    t_bench0 = time.perf_counter()
    for i in range(_MAX_ATTEMPTS):
        if i > 0:
            elapsed = time.perf_counter() - t_bench0
            est = max(a["attempt_sec"] for a in attempts)
            if elapsed + est > _BENCH_BUDGET_S:
                print(
                    f"# budget: {elapsed:.0f}s elapsed + ~{est:.0f}s/attempt "
                    f"> {_BENCH_BUDGET_S:.0f}s — no further attempts",
                    file=sys.stderr,
                )
                break
        # pre-series idle probe (VERDICT r12 #4): don't spend an attempt
        # discovering a noisy window — wait (bounded by the probe phase's
        # OWN budget share, counted across the whole run) for a quiet one.
        # the adjudicated set lives OUTSIDE the attempt loop (ADVICE r13):
        # a canary already adjudicated as a stable plan cost must not
        # re-block later attempts' probes with a fresh
        # 8s-sleep-plus-extra-pass re-trial per attempt.
        floors = _probe_floors(prev, sf_val, names)
        for n in plan_cost_canaries:
            floors.pop(n, None)
        last_obs: dict[str, float] = {}
        while floors:
            t_p0 = time.perf_counter()
            obs = _probe_once(spark, fns, sf_dir, floors)
            # probe passes spend wall-clock too — count them against the
            # probe phase budget alongside the sleeps (ADVICE r13)
            probe_waited += time.perf_counter() - t_p0
            noisy, plan_cost = _probe_verdict(floors, obs, last_obs)
            last_obs.update(obs)
            for n in plan_cost:
                print(
                    f"# probe: {n} {obs[n]:.3f}s > {_PROBE_TOL}x floor "
                    f"{floors[n]:.3f}s but REPRODUCED — plan cost, canary "
                    "dropped (idle re-measure will adjudicate)",
                    file=sys.stderr,
                )
                floors.pop(n)
                plan_cost_canaries.add(n)
            if not noisy:
                break
            print(
                "# probe: noisy window — "
                + ", ".join(
                    f"{n} {obs[n]:.3f}s vs floor {floors[n]:.3f}s"
                    for n in sorted(noisy)
                ),
                file=sys.stderr,
            )
            if probe_waited > _PROBE_PHASE_FRACTION * _BENCH_BUDGET_S or (
                attempts
                and time.perf_counter() - t_bench0
                + max(a["attempt_sec"] for a in attempts)
                + _PROBE_WAIT_S
                > _BENCH_BUDGET_S
            ):
                print(
                    "# probe: phase budget spent — measuring anyway",
                    file=sys.stderr,
                )
                break
            time.sleep(_PROBE_WAIT_S)
            probe_waited += _PROBE_WAIT_S
        print(f"# --- attempt {i + 1}/{_MAX_ATTEMPTS} ---", file=sys.stderr)
        a = _measure_attempt(spark, fns, names, sf_dir, prev, sf_val)
        attempts.append(a)
        if i == 0:
            # parity is measured at the SAME point every round — after
            # exactly one query series — so its p50 compares against the
            # historical band regardless of how many retry attempts this
            # run needs (measured: after three series the same host read
            # 2829 ms vs 2370 after one — JVM heap/GC state, not view lag)
            parity = _parity_metrics(spark, sf_dir)
        if _attempt_is_idle(a):
            break  # fully idle — the headline convention is satisfied

    chosen = next((a for a in attempts if _attempt_is_idle(a)), None)
    if chosen is not None:
        headline_source = "fully_idle_attempt"
    else:
        # No attempt came back clean: ship the honest corrected total
        # (min value_clean). "value" is the CHOSEN attempt's as-measured
        # companion — another attempt may show a lower as-measured total,
        # but mixing fields across attempts would make the summary
        # incoherent; every attempt's full detail is on stderr.
        chosen = min(attempts, key=lambda a: a["value_clean"])
        headline_source = "min_clean_of_contended"

    parity_compact = _parity_compact(parity)

    # Bulky detail to stderr: every attempt's run arrays and clean maps
    # (the contention narrative) and the full parity block.
    print(
        json.dumps({"attempts": attempts, "parity": parity}), file=sys.stderr
    )
    # Compact parity line LAST on stderr (VERDICT r11 #4): short enough
    # that a tail window which decapitates the bulky line above still
    # carries the headline freshness fields in parseable form.
    print("# parity " + json.dumps(parity_compact), file=sys.stderr)
    # COMPACT summary is the FINAL stdout line — the only stdout line —
    # sized to survive the driver's tail capture (VERDICT r6 #2).
    summary = {
        "metric": "headline_queries_total_runtime",
        "value": chosen["value"],
        "unit": "sec",
        "queries": chosen["queries"],
        # for a fully-idle attempt these EQUAL the as-measured
        # map; they differ only when no attempt came back clean
        "queries_clean": chosen["queries_clean"],
        "value_clean": chosen["value_clean"],
        "contended": chosen["contended"],
        "idle_remeasure": chosen["idle_remeasure"],
        "attempts_run": len(attempts),
        "headline_attempt": attempts.index(chosen) + 1,
        "headline_source": headline_source,
        "parity": parity_compact,
        "sf": sf_val,
    }
    print(_degrade_summary(summary))


def _degrade_summary(summary: dict) -> str:
    """Serialize the stdout summary, degrading deterministically until it
    fits the driver's tail-capture window. The driver parses the last
    ~2000 chars of combined output: a line longer than the window
    decapitates and parses NULL (the round-6 failure). Worst case is a
    fully-contended attempt (3 per-query maps). The untrimmed summary is
    already on stderr inside the detail blob; the final two steps
    (ADVICE r12) guarantee the line lands under the cap even for a
    future larger HEADLINE set — everything left after them is
    O(1)-sized."""
    line = json.dumps(summary)
    if len(line) > _MAX_SUMMARY_CHARS:
        summary["idle_remeasure"] = sorted(summary["idle_remeasure"])
        summary["idle_remeasure_note"] = "values in stderr detail (tail cap)"
        line = json.dumps(summary)
    if len(line) > _MAX_SUMMARY_CHARS:
        del summary["queries_clean"]
        summary["queries_clean_note"] = (
            "omitted (tail cap): min(queries, idle re-measures), "
            "full map in stderr detail"
        )
        line = json.dumps(summary)
    if len(line) > _MAX_SUMMARY_CHARS:
        del summary["queries"]
        summary["queries_note"] = "omitted (tail cap): map in stderr detail"
        line = json.dumps(summary)
    if len(line) > _MAX_SUMMARY_CHARS:
        # keep the counts under NEW keys and drop the lists: a later run's
        # _previous_round_bench does set(prev["contended"]) — leaving an
        # int under the list's key would crash NEXT round's bench before
        # attempt 1 (review r13 #2)
        summary["contended_n"] = len(summary.pop("contended"))
        summary["idle_remeasure_n"] = len(summary.pop("idle_remeasure"))
        line = json.dumps(summary)
    return line


def _still_falling(runs: list[float]) -> bool:
    """True when the run sequence is strictly falling AND the total
    decline is MATERIAL (>5% first-to-last). The contention guard exists
    to catch host load easing mid-measurement — drops of 2-5x — where the
    minimum is still far above the true plan cost. A monotone 1-3% glide
    is JIT / page-cache warming on a perfectly idle host (observed: four
    sub-0.7s queries flagged on a quiet host with idle re-measures EQUAL
    to their as-measured values); without the materiality bound those
    false flags would deny every attempt fully-idle status now that
    idleness gates the headline convention. A <5% residual descent means
    the recorded minimum is within 5% of the true cost — immaterial."""
    if not all(b < a for a, b in zip(runs, runs[1:])):
        return False
    return runs[-1] < 0.95 * runs[0]


def _attempt_is_idle(a: dict) -> bool:
    """FULLY IDLE means no evidence of CONTAMINATION — not merely "no
    trigger fired". The slow-vs-prev trigger also fires on a genuine plan
    regression, whose quiet re-measure comes back just as slow; treating
    that as dirt would make the retry permanently unsatisfiable and label
    every subsequent round 'min_clean_of_contended' on an idle host
    (review r12 #2 — the exact misattribution VERDICT r7 #3 exists to
    prevent). So: no contention flags, and every idle re-measure CONFIRMS
    its as-measured value (didn't beat it by >10% — contention inflates
    the original; a confirming re-run means the number is a real plan
    cost, properly shipped as a slower headline)."""
    if a["contended"]:
        return False
    return all(
        idle >= 0.9 * a["queries"][n]
        for n, idle in a["idle_remeasure"].items()
    )


# Pre-series idle probe (VERDICT r12 #4): before spending a full ~2-min
# attempt discovering contention, re-time the previous round's 3 FASTEST
# recorded lines (sub-200ms queries are the most sensitive canaries —
# fixed overhead dominates them, so host noise shows multiplicatively).
# If any probe exceeds its recorded floor by >_PROBE_TOL, the window is
# noisy: wait and re-probe instead of burning an attempt. The probe phase
# is budget-capped — measuring contended still beats recording nothing.
_PROBE_TOL = 1.5
_PROBE_WAIT_S = 8.0
_PROBE_PHASE_FRACTION = 0.2  # of _BENCH_BUDGET_S, across the whole run


def _probe_floors(prev: dict, sf_val, names: list[str]) -> dict[str, float]:
    """The 3 fastest previous-round recorded values at the SAME sf —
    {} when no comparable record exists (probe then can't judge and is
    skipped entirely)."""
    if prev.get("sf") != sf_val:
        return {}
    qc = prev.get("queries_clean")
    qc = qc if isinstance(qc, dict) else {}
    q = prev.get("queries")
    q = q if isinstance(q, dict) else {}
    floors: dict[str, float] = {}
    for n in names:
        vals = [
            v
            for v in (qc.get(n), q.get(n))
            if isinstance(v, (int, float)) and v > 0
        ]
        if vals:
            floors[n] = min(vals)
    return dict(sorted(floors.items(), key=lambda kv: kv[1])[:3])


def _probe_once(
    spark, fns, sf_dir: str, floors: dict[str, float]
) -> dict[str, float]:
    """One probe pass: warm-up + best-of-2 per canary."""
    obs: dict[str, float] = {}
    for name in floors:
        _timed_run(spark, fns[name], sf_dir)  # warm-up
        obs[name] = min(_timed_run(spark, fns[name], sf_dir) for _ in range(2))
    return obs


def _probe_verdict(
    floors: dict[str, float],
    obs: dict[str, float],
    last_obs: dict[str, float],
) -> tuple[set, set]:
    """Classify this probe pass: (noisy, plan_cost). A canary above
    _PROBE_TOL x floor whose value REPRODUCES the previous pass within
    10% is a genuine plan cost, not host noise (review r13 #3 — noise
    swings between passes; a real regression is stable): it must stop
    blocking the series, and the attempt's own slow-vs-prev idle
    re-measure will adjudicate it properly."""
    over = {
        n
        for n, floor in floors.items()
        if obs.get(n, 0.0) > _PROBE_TOL * floor
    }
    stable = {
        n
        for n in over
        if n in last_obs and abs(obs[n] - last_obs[n]) <= 0.1 * last_obs[n]
    }
    return over - stable, stable


def _measure_attempt(
    spark, fns, names: list[str], sf_dir: str, prev: dict, sf_val
) -> dict:
    """One full measurement attempt over ``names``: per-query best-of with
    the contention guard, then the end-of-attempt idle re-measure of every
    contended or slower-than-prev line. Returns the attempt's as-measured
    and corrected maps; an attempt with empty "contended" AND empty
    "idle_remeasure" is FULLY IDLE (no trigger fired anywhere)."""
    t_a0 = time.perf_counter()
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    contended: list[str] = []
    for name in names:
        # Best-of-3 per query: single-shot numbers on a shared VM swing
        # 2-5x with host contention; the minimum is the reproducible cost
        # of the plan, and the full run array ships in the JSON so a
        # regression can be told apart from host noise (spread >> min
        # means contention, not a plan change). Caches are cleared between
        # queries so no run benefits from a predecessor's materialized
        # state.
        # One UNTIMED warm-up run first: per-query codegen class-loading,
        # JIT, and page-cache effects contaminated round-4's flagship
        # number (ref_lobsters_topk runs [6.48, 2.46, 1.62] still falling
        # at best-of-3 cutoff while r3 measured 0.89). The warm-up absorbs
        # first-execution costs; the 3 timed runs then measure the plan.
        # Contention guard (VERDICT r5 #3): a strictly-falling run sequence
        # at cutoff means the minimum is still descending toward the true
        # plan cost (host contention easing mid-measurement) — extend to
        # best-of-5 for that query, and if even 5 runs are still strictly
        # falling, flag the line as contended in the JSON rather than
        # report a number known to be an overestimate.
        # noop sink inside _timed_run forces full evaluation of every
        # output column (count() alone would let Catalyst prune the
        # projection).
        runs: list[float] = []

        def timed_run():
            return _timed_run(spark, fns[name], sf_dir)

        timed_run()  # untimed warm-up (codegen/JIT/page cache)
        for _ in range(3):
            runs.append(timed_run())
        while len(runs) < 5 and _still_falling(runs):
            runs.append(timed_run())
        if _still_falling(runs):
            contended.append(name)
        timings[name] = round(min(runs), 4)
        all_runs[name] = [round(r, 4) for r in runs]
        print(
            f"# {name}: {min(runs):.3f}s (runs: {[round(r, 3) for r in runs]})",
            file=sys.stderr,
        )

    # End-of-attempt idle re-measure, when the host is at its quietest.
    # Two triggers (union):
    #  - repeat-contended (VERDICT r6 #8): contended this run AND flagged
    #    contended in the previous round's recorded bench;
    #  - round-over-round slow (VERDICT r7 #3): best-of >25% above the
    #    previous round's recorded value for the same query at the SAME sf
    #    (cross-sf comparison is meaningless — a local sf0.01 smoke run
    #    must not diff against the driver's sf0.1 record).
    # The r7 drift round shipped an EMPTY idle_remeasure because the
    # repeat-contended set happened to be empty — the artifact could not
    # prove the +21% was environmental. The slow-vs-prev trigger makes a
    # drift round re-time its own movers.
    # type-guarded: a degraded or hand-edited record must never crash the
    # NEXT round's bench (a killed bench records nothing)
    _pc = prev.get("contended")
    prev_contended = set(_pc) if isinstance(_pc, (list, tuple)) else set()
    _pq = prev.get("queries")
    prev_q = _pq if isinstance(_pq, dict) else {}
    same_sf = prev.get("sf") == sf_val
    # VERDICT r10 #6 (bench honesty): EVERY contended line is re-measured
    # at end-of-run — not just repeat-contended ones — so the artifact
    # always carries a clean per-query map (queries_clean below) next to
    # the as-measured one, whatever the host was doing mid-attempt.
    remeasure = [
        n
        for n in timings
        if n in contended
        or (
            same_sf
            and isinstance(prev_q.get(n), (int, float))
            and prev_q[n] > 0
            and timings[n] > 1.25 * prev_q[n]
        )
    ]
    idle_remeasure: dict[str, float] = {}
    for name in remeasure:
        runs = [_timed_run(spark, fns[name], sf_dir) for _ in range(3)]
        idle_remeasure[name] = round(min(runs), 4)
        why = []
        if name in contended:
            why.append(
                "repeat-contended"
                if name in prev_contended
                else "contended"
            )
        # same numeric/positive guard as the trigger above — a contended
        # query can reach here with prev_q[name] == 0 or non-numeric (a
        # tail-recovered record), which the raw comparison would crash on
        if (
            same_sf
            and isinstance(prev_q.get(name), (int, float))
            and prev_q[name] > 0
            and timings[name] > 1.25 * prev_q[name]
        ):
            why.append(f"+{(timings[name] / prev_q[name] - 1) * 100:.0f}% vs prev")
        print(
            f"# idle_remeasure {name} [{', '.join(why)}]: {min(runs):.3f}s "
            f"(runs: {[round(r, 3) for r in runs]})",
            file=sys.stderr,
        )
    # The CLEAN per-query map (VERDICT r10 #6): per query, the best of
    # the timed runs and any end-of-attempt idle re-measure — the
    # contention-corrected view, alongside the as-measured one.
    queries_clean = {
        n: round(min(timings[n], idle_remeasure.get(n, timings[n])), 4)
        for n in timings
    }
    return {
        "value": round(sum(timings.values()), 4),
        "queries": timings,
        "runs": all_runs,
        # queries whose 5 runs were STILL materially falling at cutoff:
        # their min is an overestimate (host contention easing
        # mid-measurement), not a plan cost
        "contended": contended,
        "idle_remeasure": idle_remeasure,
        "queries_clean": queries_clean,
        "value_clean": round(sum(queries_clean.values()), 4),
        "attempt_sec": round(time.perf_counter() - t_a0, 1),
    }


def _parity_compact(parity: dict) -> dict:
    """The headline freshness fields only (VERDICT r11 #4) — small enough
    to ride the stdout summary and survive any tail capture: notification
    p50/p99 vs the expected band, staleness p99 in versions, and the
    observed stale fraction vs its continuous-sampling ceiling."""
    if "error" in parity:
        return {"error": str(parity["error"])[:120]}
    lat = parity.get("notification_latency_ms") or {}
    stal = (parity.get("staleness") or {}).get("staleness_versions") or {}
    rw = parity.get("read_window") or {}
    band = parity.get("expected_p50_band_ms") or [None, None]
    p50 = lat.get("p50")
    frac = rw.get("observed_stale_fraction")
    ceil = rw.get("stale_ceiling_continuous_sampling")
    return {
        "notify_p50_ms": p50,
        "notify_p99_ms": lat.get("p99"),
        "p50_band_ms": band,
        # one-sided: the band's failure direction is SLOW (view falling
        # behind). Below-band p50 just means a faster host / smaller SF
        # than the sf0.1 calibration — report it as in-band, the raw
        # number is right alongside.
        "p50_in_band": (
            bool(p50 <= band[1])
            if isinstance(p50, (int, float))
            and isinstance(band[1], (int, float))
            else None
        ),
        "staleness_p99_versions": stal.get("p99"),
        "observed_stale_fraction": frac,
        "stale_ceiling": ceil,
        "stale_in_band": (
            bool(frac <= ceil)
            if isinstance(frac, (int, float)) and isinstance(ceil, (int, float))
            else None
        ),
    }


def _timed_run(spark, fn, sf_dir: str) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def _previous_round_bench() -> dict:
    """The compact summary recorded in the most recent BENCH_r*.json (the
    driver writes one per round next to this script): a dict with at least
    whichever of "queries" / "contended" / "sf" survived recording; {} if
    no record exists or nothing is recoverable."""
    import glob
    import re

    best: tuple[int, str] | None = None
    for path in glob.glob(str(Path(__file__).resolve().parent / "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), path)
    if best is None:
        return {}
    try:
        rec = json.loads(Path(best[1]).read_text())
        # driver shape: {"parsed": {...}, "tail": "..."} wrapping bench
        # stdout, or the raw bench line itself
        parsed = rec.get("parsed") if isinstance(rec, dict) else None
        src = parsed if isinstance(parsed, dict) else rec
        if isinstance(src, dict) and (
            "queries" in src or "contended" in src
        ):
            return src
        # round-6 shape: parsed is null (tail decapitated the JSON line);
        # per-field arrays may still be intact inside the tail text
        tail = rec.get("tail", "") if isinstance(rec, dict) else ""
        out: dict = {}
        m = re.search(r'"contended"\s*:\s*(\[[^\]]*\])', tail)
        if m:
            out["contended"] = json.loads(m.group(1))
        m = re.search(r'"queries"\s*:\s*(\{[^{}]*\})', tail)
        if m:
            out["queries"] = json.loads(m.group(1))
        m = re.search(r'"sf"\s*:\s*([0-9.]+)', tail)
        if m:
            out["sf"] = float(m.group(1))
        return out
    except Exception:
        return {}


def _parity_metrics(spark, sf_dir: str, budget_s: float = 150.0) -> dict:
    """Bounded wrapper: the measurement runs in a worker thread with a hard
    time budget so a wedged streaming teardown (or a badly contended host)
    can degrade the parity block to an error note instead of hanging the
    whole bench run."""
    import threading

    box: dict = {}

    def run():
        box["result"] = _parity_metrics_inner(spark, sf_dir)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=budget_s)
    if t.is_alive():
        return {"error": f"parity measurement exceeded {budget_s}s budget"}
    return box.get("result", {"error": "parity thread died"})


def _parity_metrics_inner(spark, sf_dir: str) -> dict:
    """The reference's evaluation machinery, measured for real: per-batch
    notification latency percentiles (metrics.go:78-101 shape) and the
    staleness-in-versions distribution (metrics.go:103-214 shape), from a
    live SumView maintaining the events aggregation over a 4-chunk replay
    while a reader samples view.version() concurrently."""
    import threading
    import time as _t

    from proteus_spark.registry import load
    from proteus_spark.sources import cdc
    from proteus_spark.streaming.metrics import (
        FreshnessListener,
        staleness_report,
    )
    from proteus_spark.streaming.views import SumView

    listener = FreshnessListener()
    spark.streams.addListener(listener)
    samples: list[tuple[int, int]] = []
    try:
        ev = load(spark, sf_dir, "events").select("user_id", "value")
        src = cdc.stage_stream(spark, ev, chunks=4)
        view = SumView(
            spark, src.subscribe(), group_by="user_id", agg_attr="value",
            name="bench_parity_sum_view", mode="append",
        ).start()

        stop = threading.Event()
        read_ms: list[tuple[float, int, float]] = []

        def sample_reader():
            # a "read" = note the version its snapshot came from, do the
            # read, then compare against the latest committed version:
            # staleness = versions that advanced while the read ran.
            # Per-read duration is recorded because freshness is
            # MECHANICALLY coupled to it: a sample is stale iff a commit
            # lands inside its read window, so expected stale fraction
            # ~ commits x mean_read / elapsed — on a slow host, reads
            # stretch and fresh_fraction drops with NO view-lag change
            # (VERDICT r7 #7: make that attribution provable in the
            # artifact instead of narrated).
            while not stop.is_set():
                observed = view.version()
                t0 = _t.monotonic()
                snap = view.snapshot()
                if snap is not None:
                    snap.count()
                t1 = _t.monotonic()
                read_ms.append(((t1 - t0) * 1000.0, observed, t1))
                samples.append((view.version(), observed))
                _t.sleep(0.02)

        reader = threading.Thread(target=sample_reader, daemon=True)
        t_start = _t.monotonic()
        reader.start()
        try:
            view.await_catch_up()
        finally:
            elapsed_ms = (_t.monotonic() - t_start) * 1000.0
            stop.set()
            reader.join(timeout=2)
            try:
                spark.streams.removeListener(listener)
            except Exception:
                pass
            view.stop()
            cdc.cleanup(src)
        report = listener.report().get("bench_parity_sum_view", {})
        # versions observed before the first commit are warm-up, not lag
        live = [(w, o) for w, o in samples if o >= 0]
        # read-window attribution (VERDICT r7 #7): a sample goes stale
        # iff a commit's version bump lands between its two version()
        # reads — i.e. inside its read window. Two mechanical bounds
        # bracket the HOST-ONLY story: (a) independent tiny windows,
        # commits x sum(read)/elapsed/n — the floor if reads and commits
        # were uncorrelated; (b) continuous sampling, commits/samples —
        # the ceiling, since the reader nearly always has a sample in
        # flight and each bump can stale at most that one sample.
        # observed inside [floor, ceiling] (and staleness p99 <= 1
        # version) => freshness moved with sampling mechanics / host
        # speed, NOT view lag; observed above the ceiling or staleness
        # >= 2 versions => the view itself fell behind — investigate.
        from proteus_spark.streaming.metrics import percentiles

        n_batches = report.get("batches") or 0
        # warm-up reads (before the first commit: snapshot None, ~0 ms)
        # are excluded — they would dilute both bounds and the read_ms
        # distribution into meaninglessness
        live_reads = [(ms, t) for ms, o, t in read_ms if o >= 0]
        n_samp = len(live_reads)
        live_span = (
            (live_reads[-1][1] - live_reads[0][1]) * 1000.0
            if n_samp >= 2
            else 0.0
        )
        floor_stale = (
            min(
                1.0,
                n_batches
                * (sum(ms for ms, _ in live_reads) / live_span)
                / n_samp,
            )
            if live_span > 0 and n_samp
            else None
        )
        ceil_stale = (
            min(1.0, n_batches / n_samp) if n_samp else None
        )
        lags = [w - o for w, o in live]
        observed_stale = (
            sum(1 for x in lags if x > 0) / len(lags) if lags else None
        )
        return {
            "notification_latency_ms": report.get("latency_ms", {}),
            "batches": report.get("batches"),
            "rows": report.get("rows"),
            "staleness": staleness_report(live),
            "read_window": {
                "read_ms": percentiles([ms for ms, _ in live_reads]),
                "elapsed_ms": round(elapsed_ms, 1),
                "live_span_ms": round(live_span, 1),
                "stale_floor_independent_windows": (
                    round(floor_stale, 3) if floor_stale is not None else None
                ),
                "stale_ceiling_continuous_sampling": (
                    round(ceil_stale, 3) if ceil_stale is not None else None
                ),
                "observed_stale_fraction": (
                    round(observed_stale, 3)
                    if observed_stale is not None
                    else None
                ),
            },
            # The view runs the DEFAULT micro-batch trigger (no interval):
            # notification latency == batch processing time (4-chunk file
            # replay + LSM commit), so p50 tracks host speed, not a
            # configured cadence. Measured band across rounds 2-4:
            # 2045 / 2338 / 2306 ms. Treat p50 inside [1700, 2700] as
            # cadence noise; outside it as a real freshness change.
            "trigger": "default micro-batch (no processingTime interval)",
            "expected_p50_band_ms": [1700, 2700],
        }
    except Exception as exc:  # parity metrics must never fail the bench
        return {"error": str(exc)[:200]}
    finally:
        try:
            spark.streams.removeListener(listener)
        except Exception:
            pass


if __name__ == "__main__":
    main()
