"""The bench harness's survival logic, unit-tested.

BENCH_r04.json was rc=124/parsed=null — the one artifact the driver
parses came back empty because the harness's deadline logic could not
protect the headline (VERDICT r4, weak #1). The fix lives in bench.py
as module-level `budget_ok` / `run_capped_tier`; these tests pin the
contract so future tier growth can't silently reintroduce the failure
mode. IMATCH_BENCH_FORCE_CPU=1 is set BEFORE the import: this jax
build ignores JAX_PLATFORMS (conftest.py — the axon TPU plugin
self-registers), so without it the import-time accelerator probe
subprocess would grab the single-client TPU tunnel lease, or stall up
to the probe timeout on a hung tunnel, from inside a unit-test run.
"""

import os
import time

os.environ["IMATCH_BENCH_FORCE_CPU"] = "1"

import bench


class TestBudgetOk:
    def test_fits_with_margin(self):
        assert bench.budget_ok(left_s=500, est_s=100)

    def test_rejects_when_estimate_eats_budget(self):
        # the r04 failure shape: positive time left, but not enough for
        # the tier — old `left > 0` said yes, the kill landed mid-tier
        assert not bench.budget_ok(left_s=50, est_s=100)

    def test_margin_is_required_not_optional(self):
        assert not bench.budget_ok(left_s=130, est_s=100)  # < est + 60
        assert bench.budget_ok(left_s=161, est_s=100)

    def test_negative_budget(self):
        assert not bench.budget_ok(left_s=-10, est_s=0)


class TestRunCappedTier:
    def test_returns_tier_dict(self):
        out = bench.run_capped_tier(
            lambda: {"x": 1}, cap_s=5, skip_key="k", abandoned={}
        )
        assert out == {"x": 1}

    def test_timeout_records_skip_and_abandons(self):
        abandoned = {}
        logs = []
        t0 = time.perf_counter()
        out = bench.run_capped_tier(
            lambda: time.sleep(30),
            cap_s=0.2,
            skip_key="slow_skipped",
            abandoned=abandoned,
            name="slow",
            log=logs.append,
        )
        assert time.perf_counter() - t0 < 5  # did not wait out the sleep
        assert out["slow_skipped"].startswith("timeout")
        assert abandoned["flag"] is True
        assert logs and "hard cap" in logs[0]

    def test_later_tiers_skip_after_abandonment(self):
        ran = []
        out = bench.run_capped_tier(
            lambda: ran.append(1) or {"y": 2},
            cap_s=5,
            skip_key="later_skipped",
            abandoned={"flag": True},
        )
        assert out == {"later_skipped": "skipped: a prior tier timed out"}
        assert not ran  # the tier function must not even start

    def test_exception_becomes_error_record_not_crash(self):
        def boom():
            raise RuntimeError("tier exploded")

        out = bench.run_capped_tier(
            boom, cap_s=5, skip_key="b_skipped", abandoned={}
        )
        assert out["b_skipped"].startswith("error: tier exploded")

    def test_none_result_becomes_error_record(self):
        # a tier returning None must not poison extras.update(...)
        out = bench.run_capped_tier(
            lambda: None, cap_s=5, skip_key="n_skipped", abandoned={}
        )
        assert out == {"n_skipped": "error: tier returned NoneType"}
