"""Unit tests for bench.py's noise-gate helpers (no SparkSession).

Covers VERDICT r14 item 4 (per-query flagging: a seeded slow query in a
fixture gets flagged) and ADVICE r14 (the pinned io seed is host-scoped:
trusted only when a committed artifact corroborates it).
"""

import json
import os

import pytest

import bench


def _write(path, doc):
    with open(path, "w") as f:
        json.dump(doc, f)


# --------------------------------------------------------------- flagging


def test_seeded_slow_query_gets_flagged():
    quiet = {"fast_q": 2.0, "tiny_q": 0.1, "ok_q": 1.0}
    now = {"fast_q": 3.2, "tiny_q": 0.4, "ok_q": 1.1, "new_q": 9.9}
    flagged = bench.flag_slow_rows(now, quiet)
    # 3.2/2.0 = 1.6 > 1.3 and baseline 2.0 >= floor -> flagged
    assert flagged == {"fast_q": 1.6}
    # tiny_q quadrupled but its baseline is under the floor (scheduler
    # noise territory); ok_q is inside the ratio; new_q has no baseline


def test_flagging_ignores_failed_rows():
    assert bench.flag_slow_rows({"q": -1.0}, {"q": 5.0}) == {}


def test_quiet_mins_elementwise_and_ratchet(tmp_path):
    root = str(tmp_path)
    _write(
        os.path.join(root, "BENCH_QUIET.json"),
        {"queries_min3": {"a": 1.0, "b": 4.0}},
    )
    _write(
        os.path.join(root, "BENCH_DETAIL.json"),
        {"queries_min3": {"a": 2.0, "b": 3.0, "c": 7.0}},
    )
    mins = bench.quiet_query_mins(root)
    assert mins == {"a": 1.0, "b": 3.0, "c": 7.0}
    # the sidecar only ratchets DOWN: a slower run cannot raise a baseline
    bench.update_quiet_sidecar(root, {"a": 5.0, "b": 2.5, "d": 1.2})
    mins2 = bench.quiet_query_mins(root)
    assert mins2["a"] == 1.0 and mins2["b"] == 2.5 and mins2["d"] == 1.2


def test_quiet_mins_missing_files_is_empty(tmp_path):
    assert bench.quiet_query_mins(str(tmp_path)) == {}


# ----------------------------------------------------------- io seed scope


def test_io_seed_requires_corroboration(monkeypatch):
    monkeypatch.delenv(bench._IO_SEED_ENV, raising=False)
    # this host's artifacts sit near the seed -> trusted
    assert bench._seed_io_vals([0.7, 0.9]) == [bench._IO_SEED]
    # a foreign (slower-disk) host: every committed calibration is far
    # above the seed -> the seed would mis-fire the gate on every run
    assert bench._seed_io_vals([1.9, 2.4]) == []
    # no artifacts at all -> nothing to corroborate with
    assert bench._seed_io_vals([]) == []


def test_io_seed_env_override(monkeypatch):
    monkeypatch.setenv(bench._IO_SEED_ENV, "0.5")
    assert bench._seed_io_vals([9.0]) == [0.5]
    monkeypatch.setenv(bench._IO_SEED_ENV, "")
    assert bench._seed_io_vals([0.63]) == []


def test_quiet_baselines_harvests_round_artifacts(tmp_path, monkeypatch):
    monkeypatch.delenv(bench._IO_SEED_ENV, raising=False)
    root = str(tmp_path)
    _write(
        os.path.join(root, "BENCH_r01.json"),
        {"parsed": {"calib_io_sec": 0.70, "calib_sec": 0.80}},
    )
    _write(
        os.path.join(root, "BENCH_DETAIL.json"),
        {"calib_io_sec": 0.66, "calib_sec": 0.75},
    )
    io, cpu = bench.quiet_baselines(root)
    assert io == pytest.approx(bench._IO_SEED)  # corroborated by 0.66
    assert cpu == pytest.approx(0.75)


def test_quiet_baselines_skip_lower_core_artifacts(tmp_path, monkeypatch):
    """A committed lower-core scaling artifact (wrapper cpus != sidecar
    width) must not contribute its calibration: at 8 cores the
    single-threaded CPU calib runs faster than any full-width capture
    can, so harvesting it stamps every later official run 'contended'
    (observed live with BENCH_r16_c8.json, calib 0.315 vs 0.44+)."""
    monkeypatch.delenv(bench._IO_SEED_ENV, raising=False)
    root = str(tmp_path)
    _write(
        os.path.join(root, "BENCH_r01.json"),
        {"cpus": 32, "parsed": {"calib_io_sec": 2.0, "calib_sec": 2.2}},
    )
    _write(
        os.path.join(root, "BENCH_r01_c8.json"),
        {"cpus": 8, "parsed": {"calib_io_sec": 1.1, "calib_sec": 0.3}},
    )
    # pre-r16 wrapper without a cpus field: full-width round, kept
    _write(
        os.path.join(root, "BENCH_r02.json"),
        {"parsed": {"calib_io_sec": 1.9, "calib_sec": 2.1}},
    )
    io, cpu = bench.quiet_baselines(root)
    assert io == pytest.approx(1.9) and cpu == pytest.approx(2.1)


def test_quiet_baselines_foreign_host_ignores_seed(tmp_path, monkeypatch):
    monkeypatch.delenv(bench._IO_SEED_ENV, raising=False)
    root = str(tmp_path)
    _write(
        os.path.join(root, "BENCH_r01.json"),
        {"parsed": {"calib_io_sec": 2.0, "calib_sec": 2.2}},
    )
    io, cpu = bench.quiet_baselines(root)
    assert io == pytest.approx(2.0) and cpu == pytest.approx(2.2)


def test_calib_mins_ratchet_through_sidecar(tmp_path, monkeypatch):
    """The gate's quiet calibration baseline survives BENCH_DETAIL being
    overwritten by a contended capture: update_quiet_sidecar ratchets
    calib medians into BENCH_QUIET.json, and quiet_baselines reads them."""
    monkeypatch.delenv(bench._IO_SEED_ENV, raising=False)
    root = str(tmp_path)
    # quiet run writes the sidecar...
    bench.update_quiet_sidecar(root, {"q": 1.0},
                               calib_io_min=0.70, calib_cpu_min=0.50)
    # ...then a contended capture overwrites BENCH_DETAIL with worse
    # calibrations; the ratchet must keep the quiet evidence
    bench.update_quiet_sidecar(root, {"q": 2.0},
                               calib_io_min=1.40, calib_cpu_min=0.90)
    _write(os.path.join(root, "BENCH_DETAIL.json"),
           {"calib_io_sec": 1.40, "calib_sec": 0.90,
            "queries_min3": {"q": 2.0}})
    io, cpu = bench.quiet_baselines(root)
    assert io == pytest.approx(0.70) and cpu == pytest.approx(0.50)
    # per-query mins ratcheted independently
    assert bench.quiet_query_mins(root)["q"] == 1.0


def test_calib_ratchet_ignores_unmeasured(tmp_path):
    root = str(tmp_path)
    bench.update_quiet_sidecar(root, {}, calib_io_min=-1.0, calib_cpu_min=-1.0)
    doc = json.load(open(os.path.join(root, "BENCH_QUIET.json")))
    assert doc["calib_io_min"] == -1.0 and doc["calib_cpu_min"] == -1.0
    bench.update_quiet_sidecar(root, {}, calib_io_min=0.8, calib_cpu_min=-1.0)
    doc = json.load(open(os.path.join(root, "BENCH_QUIET.json")))
    assert doc["calib_io_min"] == 0.8 and doc["calib_cpu_min"] == -1.0


# -------------------------------------------- calibration ratchet hysteresis


def test_calib_ratchet_fluke_needs_corroboration():
    """ADVICE r15: one anomalously fast calibration sample (warm page
    cache) must NOT permanently lower the quiet baseline; it is held as
    pending until a second run corroborates it within the band."""
    # first evidence adopts
    assert bench._ratchet_calib(-1.0, -1.0, 0.70) == (0.70, -1.0)
    # within-band improvement adopts immediately (0.60*1.25 >= 0.70)
    assert bench._ratchet_calib(0.70, -1.0, 0.60) == (0.60, -1.0)
    # >band drop is held pending, baseline unchanged
    assert bench._ratchet_calib(0.70, -1.0, 0.30) == (0.70, 0.30)
    # an ordinary next run discards the fluke
    assert bench._ratchet_calib(0.70, 0.30, 0.68) == (0.68, -1.0)
    # ...but a second corroborating run adopts the improvement
    assert bench._ratchet_calib(0.70, 0.30, 0.33) == (0.30, -1.0)
    # unmeasured runs keep both baseline and pending
    assert bench._ratchet_calib(0.70, 0.30, -1.0) == (0.70, 0.30)
    # a slower run never raises the baseline
    assert bench._ratchet_calib(0.70, -1.0, 0.90) == (0.70, -1.0)


def test_calib_ratchet_fluke_held_through_sidecar(tmp_path, monkeypatch):
    monkeypatch.delenv(bench._IO_SEED_ENV, raising=False)
    root = str(tmp_path)
    bench.update_quiet_sidecar(root, {}, calib_io_min=0.70, calib_cpu_min=0.50)
    # fluke run: far below the quiet min -> pending, not adopted
    bench.update_quiet_sidecar(root, {}, calib_io_min=0.30, calib_cpu_min=0.50)
    doc = json.load(open(os.path.join(root, "BENCH_QUIET.json")))
    assert doc["calib_io_min"] == 0.70 and doc["calib_io_pending"] == 0.30
    io, _cpu = bench.quiet_baselines(root)
    assert io == pytest.approx(0.70)  # the gate never sees the fluke
    # corroborating second run adopts
    bench.update_quiet_sidecar(root, {}, calib_io_min=0.32, calib_cpu_min=0.50)
    doc = json.load(open(os.path.join(root, "BENCH_QUIET.json")))
    assert doc["calib_io_min"] == 0.30 and doc["calib_io_pending"] == -1.0


# ------------------------------------------------- capture self-attribution


def test_classify_capture_branches():
    """VERDICT r15 item 5: the artifact stamps its own noise attribution
    — contended vs quiet vs the degenerate states — plus the
    quiet-ratchet total over this run's rows."""
    res_ok = {"calib_io_sec": 0.65, "calib_sec": 0.50}
    quiet = {"a": 1.0, "b": 2.0}
    now = {"a": 1.2, "b": 2.4, "c": 3.0}  # c has no quiet baseline

    status, qt = bench.classify_capture(True, res_ok, 1.05, True, quiet, now)
    assert status == "quiet" and qt == pytest.approx(3.0)

    status, qt = bench.classify_capture(True, res_ok, 1.30, True, quiet, now)
    assert status == "contended" and qt == pytest.approx(3.0)

    status, _ = bench.classify_capture(False, res_ok, 1.0, False, {}, now)
    assert status == "ungated"

    status, _ = bench.classify_capture(
        True, {"calib_io_sec": -1.0, "calib_sec": 0.5}, 1.0, True, quiet, now
    )
    assert status == "unmeasured"

    status, qt = bench.classify_capture(True, res_ok, 1.0, False, {}, now)
    assert status == "no-baseline" and qt == -1.0

    # failed rows (-1) are excluded from the quiet total
    _, qt = bench.classify_capture(
        True, res_ok, 1.0, True, quiet, {"a": -1.0, "b": 2.2}
    )
    assert qt == pytest.approx(2.0)


# ------------------------------------------------------ sidecar core shape


def test_sidecar_records_and_reports_core_shape(tmp_path):
    """r16: the quiet floors are per (host, core count). The sidecar
    stamps the width it was captured at; a missing field (pre-r16
    sidecars) reads as the committed graded shape '32'. main() uses this
    to skip ratcheting/flagging/clobbering on the driver's lower-core
    scaling pass — an 8-core sweep of the graded dir wrote 8-core floors
    into the sidecar this round (overhead-bound rows run FASTER on fewer
    cores) and every later full-width capture would have read flagged."""
    root = str(tmp_path)
    _write(
        os.path.join(root, "BENCH_QUIET.json"),
        {"queries_min3": {"a": 1.0}},
    )
    assert bench._sidecar_cpus(root) == "32"
    bench.update_quiet_sidecar(root, {"a": 0.9}, cpus="32")
    assert bench._sidecar_cpus(root) == "32"
    bench.update_quiet_sidecar(root, {"a": 0.8}, cpus="8")
    # the writer records whatever width the caller passed; the SKIP
    # decision lives in main() (official_shape), which never calls the
    # writer on a mismatch — this pins the field round-trip
    assert bench._sidecar_cpus(root) == "8"


def test_sidecar_cpus_defaults_when_missing(tmp_path):
    assert bench._sidecar_cpus(str(tmp_path)) in ("32", os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
