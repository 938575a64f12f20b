"""The bench idle-gate contract (r13, judge ask #1): a hot machine must
be unable to produce the round's record. These pin the drain/refuse
logic without spinning a Spark session (bench imports are lazy)."""

import bench


def test_wait_for_idle_passes_when_cool(monkeypatch):
    monkeypatch.setattr(bench, "_loadavg", lambda: [0.2, 0.3, 0.5])
    load, hot = bench._wait_for_idle(1.5, waits=2, wait_sec=0)
    assert not hot and load == [0.2, 0.3, 0.5]


def test_wait_for_idle_drains_then_passes(monkeypatch):
    # a drained 1-min load is NOT enough (r13): the 5-min average must
    # clear the gate before a pass may run
    seq = [[4.0, 3.0, 2.0], [0.9, 2.0, 2.0], [0.5, 0.8, 1.0]]
    monkeypatch.setattr(bench, "_loadavg",
                        lambda: seq.pop(0) if seq else [0.5, 0.8, 1.0])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    load, hot = bench._wait_for_idle(1.5, waits=5, wait_sec=0)
    assert not hot and load[1] <= 1.5


def test_wait_for_idle_blocks_on_hot_one_minute_load(monkeypatch):
    # r15 tightening: a green 5-min with a hot 1-min means a burst is
    # running RIGHT NOW (the r15 contaminated pass started at
    # 1-min 2.96 / 5-min 1.24) — the gate must wait it out
    seq = [[2.96, 1.24, 1.64], [0.5, 0.9, 1.2]]
    monkeypatch.setattr(bench, "_loadavg",
                        lambda: seq.pop(0) if seq else [0.5, 0.9, 1.2])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    load, hot = bench._wait_for_idle(1.5, waits=3, wait_sec=0)
    assert not hot and load == [0.5, 0.9, 1.2]


def test_wait_for_idle_reports_hot_when_never_drains(monkeypatch):
    monkeypatch.setattr(bench, "_loadavg", lambda: [5.0, 4.0, 3.0])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    load, hot = bench._wait_for_idle(1.5, waits=2, wait_sec=0)
    assert hot


def test_attempt_aborts_suite_when_anchor_stays_hot(monkeypatch):
    # A tripped anchor gate aborts the pass BEFORE the headline suite —
    # on every attempt, including the last: main() discards hot passes
    # unconditionally, so finishing ~70 queries on a hot box is pure
    # waste (r13 ADVICE). The fake anchor reads above the gate twice
    # (initial + retry); no HEADLINE query may run.
    ran = []

    def fake_run(queries, name, spark, sf_dir, best_of, timings):
        ran.append(name)
        timings[name] = 99.0  # always above the 3.5 s gate

    monkeypatch.setattr(bench, "_run", fake_run)
    monkeypatch.setattr(bench, "_loadavg", lambda: [0.1, 0.2, 0.3])

    class _Doc:
        @staticmethod
        def cache():
            return _Doc()

        @staticmethod
        def count():
            return 0

    class _Entry:
        @staticmethod
        def _t(spark, sf_dir, name):
            return _Doc()

        @staticmethod
        def bench_prepare(spark, sf_dir):
            raise AssertionError("bench_prepare must not run on a hot "
                                 "anchor")

    monkeypatch.setattr(bench, "entrymod", _Entry)
    timings, build, hot = bench._attempt(
        spark=None, queries={}, sf_dir="x", best_of=1, sf=0.1,
        load_start=[0.1, 0.2, 0.3])
    assert hot
    anchor = bench.HEAVY[0]
    assert ran == [anchor, anchor]       # initial reading + one retry
    assert build["anchor_readings"] == [99.0, 99.0]
    # the finally block still stamped the load diagnostics
    assert "loadavg_end" in build


def test_main_refuses_record_when_all_attempts_hot(monkeypatch, capsys):
    # loadavg never drains → no pass runs, no stdout JSON, exit 1
    import pytest
    monkeypatch.setattr(bench, "_loadavg", lambda: [5.0, 4.0, 3.0])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "get_spark",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("must not start spark")))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ATTEMPTS", "2")
    # get_spark is called before the gate — patch a stub session whose
    # read path would fail loudly if a pass actually started
    class _Stub:
        class sparkContext:  # noqa: N801 — mimics the pyspark attr
            @staticmethod
            def setLogLevel(level):
                return None
        class read:  # noqa: N801
            @staticmethod
            def parquet(path):
                class _C:
                    @staticmethod
                    def count():
                        return 0
                return _C()
    monkeypatch.setattr(bench, "get_spark", lambda *a, **k: _Stub())
    monkeypatch.setattr(bench.entrymod, "queries", dict)
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 1
    out = capsys.readouterr().out
    assert '"metric"' not in out     # the record line never printed


def test_run_dispersion_retry_drops_wave_runs(monkeypatch):
    """r14.75: two runs both landing in a GC wave ([5.69, 12.18]) must
    not record the wave — the >2x dispersion loop collects steady-state
    runs and the median-of-fastest-3 reports them."""
    import bench

    class _Noop:
        def format(self, *_):
            return self

        def mode(self, *_):
            return self

        def save(self, *_):
            return None

    class _Df:
        write = _Noop()

    # per-run durations -> perf_counter absolute ticks (start, end)
    durations = [5.69, 12.18, 1.8, 1.75]
    ticks = []
    t = 0.0
    for d in durations:
        ticks += [t, t + d]
        t += d + 1.0
    it = iter(ticks)
    monkeypatch.setattr(bench.time, "perf_counter", lambda: next(it))
    timings = {}
    bench._run({"q": lambda *_: _Df()}, "q", None, "sf", 2, timings)
    assert timings["q"] == 1.8

    # stable heavy entries keep single min-of-2 (no dispersion retry)
    it = iter([0.0, 6.0, 7.0, 13.2])
    timings = {}
    bench._run({"q": lambda *_: _Df()}, "q", None, "sf", 2, timings)
    assert timings["q"] == 6.0


def test_cross_round_suspects_rule():
    """r15, judge ask #2: >2x the prior round's committed value flags a
    suspect; sub-floor priors, errors, and absent priors do not."""
    prior = {"a": 1.0, "b": 0.5, "tiny": 0.05, "e": 1.0}
    timings = {
        "a": 2.5,                 # 2.5x -> suspect
        "b": 0.9,                 # 1.8x -> fine
        "tiny": 0.14,             # 2.8x but prior under the floor
        "e": {"err": "boom"},     # error entries never compare
        "new": 9.0,               # no prior -> no comparison
    }
    assert bench._cross_round_suspects(timings, prior) == ["a"]
    assert bench._cross_round_suspects({}, prior) == []
    assert bench._cross_round_suspects(timings, {}) == []


def test_load_prior_record_picks_newest_matching_sf(tmp_path):
    import json

    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"parsed": {"sf": 0.1, "queries": {"a": 1.0}}}))
    (tmp_path / "BENCH_r07.json").write_text(json.dumps(
        {"parsed": {"sf": 0.1, "queries": {"a": 2.0, "b": 1.5}}}))
    # newer but at the wrong sf — must not win
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(
        {"parsed": {"sf": 0.01, "queries": {"a": 0.2}}}))
    # newest but unparseable — must not abort the scan
    (tmp_path / "BENCH_r10.json").write_text("not json")
    fname, prior = bench._load_prior_record(str(tmp_path), 0.1)
    assert fname == "BENCH_r07.json"
    assert prior == {"a": 2.0, "b": 1.5}
    fname, prior = bench._load_prior_record(str(tmp_path / "none"), 0.1)
    assert (fname, prior) == (None, {})


def test_comparator_redrives_and_min_combines(monkeypatch):
    """Each suspect re-drives ONCE after a drain check; the record
    takes the min. A small surviving cluster passes (SCALE.md
    adjudicates); a wide one invalidates the pass."""
    monkeypatch.setattr(bench, "_load_prior_record",
                        lambda root, sf: ("BENCH_r14.json",
                                          {"a": 1.0, "b": 1.0,
                                           "c": 1.0}))
    monkeypatch.setattr(bench, "_wait_for_idle",
                        lambda gate: ([0.1, 0.2, 0.3], False))
    redrives = []

    def fake_run(queries, name, spark, sf_dir, best_of, timings):
        redrives.append(name)
        timings[name] = 0.9        # re-drive lands at steady state

    monkeypatch.setattr(bench, "_run", fake_run)
    timings = {"a": 3.0, "b": 0.8, "c": 1.1}
    build = {}
    hot = bench._apply_comparator(None, {}, "sf", 2, 0.1, timings,
                                  build, 1.5)
    assert not hot
    assert redrives == ["a"]
    assert timings == {"a": 0.9, "b": 0.8, "c": 1.1}  # min-combined
    assert build["comparator"]["suspects"] == ["a"]
    assert build["comparator"]["still_hot"] == []

    # honest regressions survive: the re-drive reproduces the slow
    # value and the entry stays, recorded at its min
    def slow_run(queries, name, spark, sf_dir, best_of, timings):
        timings[name] = 2.8

    monkeypatch.setattr(bench, "_run", slow_run)
    timings = {"a": 3.0, "b": 0.8, "c": 1.1}
    build = {}
    hot = bench._apply_comparator(None, {}, "sf", 2, 0.1, timings,
                                  build, 1.5)
    assert not hot and timings["a"] == 2.8
    assert build["comparator"]["still_hot"] == ["a"]


def test_comparator_wide_surviving_cluster_invalidates(monkeypatch):
    prior = {f"q{i}": 1.0 for i in range(8)}
    monkeypatch.setattr(bench, "_load_prior_record",
                        lambda root, sf: ("BENCH_r14.json", prior))
    monkeypatch.setattr(bench, "_wait_for_idle",
                        lambda gate: ([0.1, 0.2, 0.3], False))

    def hot_run(queries, name, spark, sf_dir, best_of, timings):
        timings[name] = 5.0        # burst still running

    monkeypatch.setattr(bench, "_run", hot_run)
    timings = {f"q{i}": 4.0 for i in range(8)}
    hot = bench._apply_comparator(None, {}, "sf", 2, 0.1, timings,
                                  {}, 1.5)
    assert hot

    # comparator only arms at the calibrated sf
    assert not bench._apply_comparator(None, {}, "sf", 2, 0.01,
                                       dict(timings), {}, 1.5)


def test_main_restarts_session_between_executed_attempts(monkeypatch):
    """r15.3: a retry attempt must not inherit the refused attempt's
    aged JVM (measured: dedup_clusters_lsh [16.3, 50.5, 20.7] s in the
    attempt-1 context vs 6.4 s in attempt 1 itself) — main() stops the
    old context and builds a fresh one before every re-run."""
    import pytest

    class _C:
        @staticmethod
        def count():
            return 0

    class _Read:
        @staticmethod
        def parquet(path):
            return _C()

    class _Sc:
        @staticmethod
        def setLogLevel(level):
            return None

    class _Stub:
        sparkContext = _Sc()
        read = _Read()

        def __init__(self):
            self.stopped = False

        def stop(self):
            self.stopped = True

    stubs = []

    def fake_get_spark(name, *a, **k):
        s = _Stub()
        stubs.append(s)
        return s

    monkeypatch.setattr(bench, "get_spark", fake_get_spark)
    monkeypatch.setattr(bench, "_loadavg", lambda: [0.1, 0.2, 0.3])
    monkeypatch.setattr(bench.entrymod, "queries", dict)
    # both attempts run and trip the anchor gate -> exit 1; the second
    # must have been handed a FRESH session, the first one stopped
    monkeypatch.setattr(bench, "_attempt",
                        lambda *a, **k: ({}, {}, True))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ATTEMPTS", "2")
    with pytest.raises(SystemExit):
        bench.main()
    assert len(stubs) == 2
    assert stubs[0].stopped and not stubs[1].stopped


def test_free_query_state_unpins_dead_checkpoints(spark):
    """r15.2 hygiene: a query's dead localCheckpoint blocks must be
    freed between queries (they otherwise accumulate for the whole
    suite — the aged-JVM degradation documented in OPTIMIZATION_r15),
    while reachable pinned frames survive."""
    import time as _time

    def _pinned_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    before = _pinned_ids()
    keep = spark.range(10).localCheckpoint(eager=True)
    dead = spark.range(100).selectExpr("id * 2 AS v") \
                .localCheckpoint(eager=True)
    new_ids = _pinned_ids() - before
    assert len(new_ids) == 2, f"expected 2 new pins, got {new_ids}"
    del dead
    bench._free_query_state(spark)
    # The ContextCleaner drains its reference queue asynchronously, and
    # the JVM-side release is genuinely slow and age-dependent: a probe
    # measured 5-23 s from del to unpin even with an explicit py4j
    # detach, growing with session age. The bench never needs the free
    # to be prompt (cleanup overlaps the next query's warmup), so the
    # test asserts it HAPPENS, on a generous deadline, not that it is
    # fast — a 30 s budget flaked in-suite.
    deadline = _time.monotonic() + 120
    remaining = _pinned_ids() & new_ids
    while len(remaining) != 1 and _time.monotonic() < deadline:
        _time.sleep(0.5)
        bench._free_query_state(spark)
        remaining = _pinned_ids() & new_ids
    assert len(remaining) == 1, (
        f"dead checkpoint blocks not freed (or live pin lost): "
        f"{remaining} of {new_ids} still pinned")
    assert keep.count() == 10
