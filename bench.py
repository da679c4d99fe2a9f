"""Full-contract benchmark. Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "vs_prev": {name: ratio, ...}, "regressions": {...},
   "regression_count": N, "retimes": {...}, "false_flags": {...}}

Every ``queries()`` entry is timed (VERDICT r5 task #3: the bench is the
regression harness, not a sampler). ``vs_prev`` compares each entry to
the newest BENCH_r*.json in the repo; an entry is PROVISIONALLY flagged
when it is BOTH >1.5x slower and >1.0s absolute slower — the absolute
floor keeps sub-second entries (which swing 2-3x on JVM state) from
producing flaky findings. The ``vs_prev`` table itself only lists
entries at >= 1s on either side (VERDICT r7 task #7: sub-second ratio
drift is pure noise and was cluttering the round review; ``queries``
still records every entry's absolute time).

A provisional flag is NOT recorded as a regression until it reproduces
in a FRESH JVM (VERDICT r6 task #4: the r6 gate cried wolf 4/159 times
from GC/JIT pressure of benching 160 entries in one JVM): each flagged
entry is re-timed warm in its own subprocess (one untimed pass, then
the timed one); only entries whose isolated time still crosses both
thresholds — or whose retime subprocess CRASHED — land in
``regressions`` (with the isolated time attached as ``fresh``).
Cleared flags are preserved in ``false_flags``; flags beyond the
retime cap (never attempted in isolation) go to ``unconfirmed``, never
to ``regressions``. ``queries`` holds the in-run time for unflagged
entries and the fresh-JVM re-time for flagged ones (an in-run value
inflated by late-run JVM pressure would poison the next round's
comparison base); the headline ``value`` stays the pure in-run wall,
captured before any overwrite. ``--gate`` exits nonzero when any confirmed
regression (or error) remains (for local pre-commit use; the driver run
stays rc=0 so the bench record is never lost to a slow entry). Retimes
settle-wait on the 1-min load average and record it; a slow retime at
high load is demoted to ``unconfirmed`` (r10 shipped two false
CONFIRMED regressions from loaded "isolated" runs). The full record is
written to BENCH_DRIVER.json on plain runs; the committed quiet-window
baseline BENCH_LOCAL.json is refreshed only by ``--record`` (never
under ``--gate``), so neither the driver's noisy run nor gate
iteration can slide the baseline under itself.

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
cores from $SPARK_GRAFT_CPUS. Each query is executed to completion
with a ``noop``-format write — every column of every row is computed
and serialized, nothing is collected. The previous action, ``count()``,
let Catalyst PRUNE expensive expressions out of an entry's FINAL
projection (no aggregate/generate above them): r7's
``hashed_embeddings_docs`` "ran" in 0.30 s because count() never
computed the embeddings at all, and the r8 posexplode reshape was then
flagged as a 17x "regression" when the same work merely became
observable. Entries whose cost lives in a terminal projection
(redaction, scoring, vector assembly) jump to their honest time under
the r8 re-baseline; aggregate-/join-rooted entries are unaffected.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pd_explain_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RATIO_TH = 1.5
ABS_FLOOR_SEC = 1.0
# A retime only CONFIRMS a regression when the machine was actually
# quiet: r10 shipped two false confirmations ("fresh 20.88s" /
# "7.24s" vs 3.9s / 1.5s judge-isolated) because the subprocess ran
# while the box was still digesting the 253-entry main run. The 1-min
# load average is the cheap honest signal — recorded per retime and
# gated here.
RETIME_LOAD_MAX = max(4.0, 0.25 * (os.cpu_count() or 8))


def _loadavg1() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - non-POSIX
        return None


def _settle(max_wait: float = 180.0) -> float | None:
    """Block until the 1-min load average decays under RETIME_LOAD_MAX
    (or ``max_wait`` elapses) and return the final reading. The load
    average lags real quiescence by up to a minute after the main bench
    JVM stops — retiming inside that window is what poisoned the r10
    confirmations."""
    load = _loadavg1()
    waited = 0.0
    while load is not None and load > RETIME_LOAD_MAX and waited < max_wait:
        time.sleep(10.0)
        waited += 10.0
        load = _loadavg1()
    return load


def _timings_from_record(d: dict) -> dict[str, float] | None:
    """Per-query timings from one record — our raw format, the driver's
    wrapper with a parsed line, or the wrapper's truncated stdout tail.

    The tail is ONLY trusted when it still contains the '"queries": {'
    opener: the driver keeps the LAST 2000 chars of stdout, and once the
    JSON line outgrew that (r6: 160 entries), the surviving suffix
    starts inside "vs_prev" — whose per-query RATIOS are shaped exactly
    like timings and silently poisoned every r7 comparison until this
    guard (minhash "prev 0.689s" was its r6 vs_prev ratio)."""
    if isinstance(d.get("queries"), dict):
        return dict(d["queries"])
    parsed = d.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return dict(parsed["queries"])
    tail = d.get("tail")
    if isinstance(tail, str) and '"queries"' in tail:
        tail = tail.split('"queries"', 1)[1]
        for marker in ('"vs_prev"', '"regressions"', '"n_entries"', '"prev_file"'):
            tail = tail.split(marker)[0]
        pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)', tail)
        # sibling scalar keys ("sf", "cpus", old-format "value"...) can
        # survive the marker cuts and would masquerade as query timings
        skip = {"value", "sf", "n_entries", "regression_count", "rc", "n", "cpus"}
        out: dict[str, float] = {}
        for k, v in pairs:
            if k not in skip and k not in out:
                out[k] = float(v)
        if out:
            return out
    return None


def _prev_timings() -> tuple[dict[str, float], str | None]:
    """Most recent usable per-query record. BENCH_LOCAL.json first — the
    full record this script writes on every run and commits per round —
    because the newest RECOVERABLE driver BENCH_r{N}.json can be many
    rounds stale (the 2000-char wrapper stopped fitting the queries dict
    at ~160 entries), and a 4-round-old baseline adjudicates against
    long-gone code. Driver records newest-first as the fallback."""
    here = os.path.dirname(os.path.abspath(__file__))
    ranked = []
    for f in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if m:
            ranked.append((int(m.group(1)), f))
    candidates = [os.path.join(here, "BENCH_LOCAL.json")]
    candidates += [f for _, f in sorted(ranked, reverse=True)]
    for f in candidates:
        try:
            with open(f) as fh:
                t = _timings_from_record(json.load(fh))
            if t:
                return t, os.path.basename(f)
        except Exception:
            continue
    return {}, None


def _retime_isolated(
    names: list[str], cap: int = 8
) -> tuple[dict[str, float | None], dict[str, float | None]]:
    """Warm re-time of each entry in its own fresh JVM (subprocess
    running ``bench.py --one NAME``): the confirmation step that
    separates a real regression from in-run GC/JIT pressure. Capped —
    a broken round that flags everything must not 8x the bench wall.

    Each retime first waits for the machine to settle and records the
    1-min load average at subprocess launch (second return value): the
    confirmation logic refuses to CONFIRM a regression whose retime ran
    at high load — that exact failure shipped two false regressions in
    the r10 record."""
    import subprocess

    out: dict[str, float | None] = {}
    loads: dict[str, float | None] = {}
    for name in names[:cap]:
        loads[name] = _settle()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True,
                text=True,
                timeout=600,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
            )
            line = r.stdout.strip().splitlines()[-1]
            out[name] = float(json.loads(line)["sec"])
        except Exception as e:
            print(f"# retime {name}: FAILED {e}", file=sys.stderr)
            out[name] = None
    return out, loads


def _force(df) -> None:
    """Execute ``df`` to completion: compute and serialize EVERY column
    of every row, collect nothing. The noop sink is the only action that
    cannot be column-pruned (see module docstring — count() silently
    dropped terminal-projection work)."""
    df.write.format("noop").mode("overwrite").save()


def _run_one(name: str) -> int:
    """--one NAME: fresh-JVM warm timing of a single entry. One untimed
    pass absorbs session start/footer reads, then the MIN of two timed
    passes is the measurement: JIT-heavy entries descend a warmup curve
    for 2-3 passes (measured r11: chisq_variants 7.9s -> 3.5s -> 1.2s in
    one JVM), so a single post-warm pass still reads 2-4x the steady
    state and CONFIRMS phantom regressions — exactly what this step
    exists to prevent. Min-of-2 sits on the curve's flat."""
    spark = get_spark("bench_one")
    fn = entrymod.queries()[name]
    _force(fn(spark, SF_DIR))
    secs = []
    for _ in range(2):
        t0 = time.time()
        _force(fn(spark, SF_DIR))
        secs.append(time.time() - t0)
    print(json.dumps({"name": name, "sec": round(min(secs), 3)}))
    return 0


def main() -> int:
    gate = "--gate" in sys.argv
    if "--one" in sys.argv:
        return _run_one(sys.argv[sys.argv.index("--one") + 1])
    spark = get_spark("bench")
    qs = entrymod.queries()
    # FIXED alphabetical timing order, decoupled from the registry's
    # driver-window rotation: registry order changes every round (the
    # 50-entry correctness window moves to the front), and in-run
    # timings are position-sensitive (JVM warmup, GC/codegen pressure
    # from earlier entries) — the r10 rotation alone shifted the shared-
    # entry in-run sum ~10% with zero code change. A stable order keeps
    # vs_prev comparisons apples-to-apples across rotations.
    names = sorted(qs)
    # Warm the JVM (codegen, parquet footer reads, shuffle service) with one
    # untimed pass: round-1 showed filter_quantity at 9.5 s cold vs ~2 s
    # warm — the 7 s delta is session start, not the query.
    try:
        _force(qs[names[0]](spark, SF_DIR))
    except Exception:
        pass
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        fn = qs[name]
        t0 = time.time()
        try:
            _force(fn(spark, SF_DIR))
        except Exception as e:  # a broken entry must not kill the record
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)
        # queries are independent: drop one query's scratch persists so
        # they don't eat executor memory from the queries after it.
        # clearCache only covers SQL cache; localCheckpoint blocks (the
        # connected-components queries) are freed by the ContextCleaner
        # once Python drops its references — gc.collect() makes that
        # happen now instead of mid-way through the next timed query.
        # With 150 entries in one JVM, leftover persisted RDD blocks
        # compound into a measurable per-entry tax late in the run —
        # explicitly unpersist anything still registered.
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                jmap[rid].unpersist(False)
        except Exception:
            pass
        import gc

        gc.collect()
    prev, prev_file = _prev_timings()
    vs_prev: dict[str, float] = {}
    provisional: dict[str, dict[str, float]] = {}
    for name, sec in timings.items():
        p = prev.get(name)
        if not p:
            continue
        ratio = round(sec / p, 3)
        # sub-second tier: a 1.5x "drift" on a 0.2s entry is JVM noise
        # (r6/r7 evidence: where_mask/topk_orders swung 1.4-1.5x on
        # nothing). Keep those entries out of the vs_prev table entirely
        # — the flag gate below already requires a >1s absolute delta,
        # so this loosens nothing on the expensive tier.
        if max(p, sec) >= 1.0:
            vs_prev[name] = ratio
        if ratio > RATIO_TH and (sec - p) > ABS_FLOOR_SEC:
            provisional[name] = {"prev": p, "now": sec, "ratio": ratio}
    regressions: dict[str, dict[str, float]] = {}
    false_flags: dict[str, dict[str, float]] = {}
    unconfirmed: dict[str, dict[str, float]] = {}
    retimes: dict[str, float | None] = {}
    # the headline wall is captured BEFORE any retime overwrites: it must
    # stay the actual in-run total (comparable across rounds regardless
    # of how many entries happened to get retimed in quiet JVMs)
    total_inrun = round(sum(timings.values()), 3)
    if provisional:
        print(
            f"# {len(provisional)} provisional flag(s) vs {prev_file}; "
            "confirming in fresh JVMs...",
            file=sys.stderr,
        )
        order = sorted(provisional, key=lambda n: -provisional[n]["ratio"])
        # release the main session BEFORE the fresh-JVM retimes: a live
        # 32-thread/128G bench JVM competing with the subprocess
        # inflates the "isolated" numbers too (measured: shapley 16.0s
        # retimed beside the live JVM, 8.3s after it stopped)
        spark.stop()
        retimes, retime_loads = _retime_isolated(order)
        for name in order:
            r = dict(provisional[name])
            p = r["prev"]
            if name not in retimes:
                # beyond the retime cap: never attempted in isolation —
                # recording it as CONFIRMED would recreate exactly the
                # cried-wolf noise the retime step exists to remove.
                # Kept visible in its own bucket instead.
                unconfirmed[name] = r
                continue
            fresh = retimes[name]
            load = retime_loads.get(name)
            if fresh is not None:
                r["fresh"] = fresh
            if load is not None:
                r["load"] = load
            if fresh is None:
                # a retime that CRASHED (subprocess error/timeout) counts
                # as a regression: failing in isolation is worse than slow
                regressions[name] = r
            elif fresh / p > RATIO_TH and (fresh - p) > ABS_FLOOR_SEC:
                if load is not None and load > RETIME_LOAD_MAX:
                    # the "isolated" confirmation itself ran on a loaded
                    # machine — a slow reading under pressure proves
                    # nothing (r10: two false CONFIRMED regressions whose
                    # judge-isolated times were at baseline). Demoted to
                    # unconfirmed, never to regressions.
                    unconfirmed[name] = r
                else:
                    regressions[name] = r
            else:
                # a FAST retime exonerates regardless of load: running at
                # baseline speed under pressure is even stronger evidence
                false_flags[name] = r
        # fresh quiet-JVM retimes are recorded in a PARALLEL key, not
        # written over the in-run timings: overwriting made the next
        # round's prev baseline systematically faster than in-run
        # conditions for exactly those entries, so they re-flagged as
        # provisional every subsequent round (r8 ADVICE — recurring
        # retime cost + false-flag noise). vs_prev now always compares
        # in-run against in-run; fresh values confirm/clear regressions
        # and stay visible in queries_fresh/retimes.
        queries_fresh = {
            name: round(fresh, 3)
            for name, fresh in retimes.items()
            if fresh is not None
        }
    else:
        queries_fresh = {}
        retime_loads = {}
    if regressions:
        print(f"# REGRESSIONS (fresh-JVM confirmed) vs {prev_file}:", file=sys.stderr)
        for name, r in sorted(regressions.items(), key=lambda kv: -kv[1]["ratio"]):
            print(
                f"#   {name}: {r['prev']:.2f}s -> {r['now']:.2f}s in-run "
                f"({r['ratio']:.2f}x), fresh {r.get('fresh', float('nan')):.2f}s",
                file=sys.stderr,
            )
    for name, r in false_flags.items():
        print(
            f"# false flag: {name} {r['prev']:.2f}s -> {r['now']:.2f}s in-run "
            f"but {r['fresh']:.2f}s isolated (JVM pressure, not a regression)",
            file=sys.stderr,
        )
    for name, r in unconfirmed.items():
        print(
            f"# unconfirmed (beyond retime cap): {name} "
            f"{r['prev']:.2f}s -> {r['now']:.2f}s in-run",
            file=sys.stderr,
        )
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    out = {
        "metric": "total_wall_sec",
        "value": total_inrun,
        "unit": "sec",
        "queries": timings,
        "queries_fresh": queries_fresh,
        "sf": sf,
        "n_entries": len(timings),
        "vs_prev": vs_prev,
        "prev_file": prev_file,
        "regressions": regressions,
        "regression_count": len(regressions),
        "retimes": retimes,
        "retime_loads": retime_loads,
        "retime_load_max": RETIME_LOAD_MAX,
        "false_flags": false_flags,
        "unconfirmed": unconfirmed,
    }
    if errors:
        out["errors"] = errors
    # full record on disk: the driver's wrapper keeps only the last
    # 2000 chars of stdout, which no longer fits 160 entries. Plain runs
    # (the driver's) write BENCH_DRIVER.json — a full record of that run
    # that never touches the committed baseline. BENCH_LOCAL.json — the
    # quiet-window baseline the next round's vs_prev reads, committed per
    # round — is refreshed ONLY by an explicit --record run (builder, on
    # an idle machine): the r10 driver run overwrote the committed quiet
    # baseline with its noisy-neighbor in-run numbers, which would have
    # adjudicated every r11 comparison against VM-pressure timings.
    # Never written under --gate either: iterating locally with the gate
    # must not slide the baseline under itself.
    record = "--record" in sys.argv
    target = "BENCH_LOCAL.json" if (record and not gate) else "BENCH_DRIVER.json"
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), target),
            "w",
        ) as fh:
            json.dump(out, fh)
    except Exception:
        pass
    # stdout carries exactly ONE JSON line, and it must FIT: the driver
    # keeps only the last ~2000 chars of stdout, so printing the full
    # 245-entry record truncated mid-line and parsed came back null
    # (BENCH_r09). The line is a compact self-contained summary —
    # totals, every regression, the slowest entries that fit, and a
    # pointer to the committed full record (BENCH_LOCAL.json, written
    # above). Trim the slowest-list until the line is under budget.
    # STABLE MARQUEE SET (r12 VERDICT task #6): the slowest-N window
    # alone turns improvements into phantom "dropped_from_bench" rows —
    # an entry that leaves the window because it got FASTER has no
    # current-round time in the compact line. Pinning the previous
    # line's query set (the 15 entries of BENCH_r12) into every future
    # line makes round-over-round comparison cover a fixed set; extra
    # slowest entries are still appended as space allows (additions are
    # fine — removals/renames are what the comparison cannot survive).
    MARQUEE = [
        "char_entropy_docs", "cumsum_events", "cuped_events",
        "curation_funnel_docs", "curation_pipeline", "embedding_near_dups",
        "many_to_one_full_rules", "minhash_against_corpus",
        "minhash_near_dups", "mix_pipeline_docs", "near_dup_index_bucketed",
        "quality_fit_evidence", "similarity_lsh_topk",
        "soft_dedup_weights_docs", "text_semantic_dedup_docs",
    ]
    marquee = [(k, timings[k]) for k in MARQUEE if k in timings]
    slowest = [
        kv for kv in sorted(timings.items(), key=lambda kv: -kv[1])
        if kv[0] not in MARQUEE
    ]
    n_slow = min(15, len(slowest))
    while True:
        compact = {
            "metric": "total_wall_sec",
            "value": total_inrun,
            "unit": "sec",
            "sf": sf,
            "n_entries": len(timings),
            "regression_count": len(regressions),
            "regressions": regressions,
            "error_count": len(errors),
            "queries": {k: round(v, 2) for k, v in marquee + slowest[:n_slow]},
            "full": target,
        }
        line = json.dumps(compact, separators=(",", ":"))
        if len(line) <= 1900 or (n_slow == 0 and not marquee):
            break
        if n_slow > 0:
            # clamp: a decrement past 0 would turn slowest[:n_slow] into
            # a NEGATIVE slice that silently keeps all-but-|n| entries
            n_slow = max(0, n_slow - 3)
        else:
            # last resort (regression-heavy line): the marquee yields
            # too, rather than printing an unparseable truncated line
            marquee = marquee[:-3] if len(marquee) > 3 else []
    print(line)
    if gate and (regressions or errors):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
