"""IMATCH_PROFILE preset semantics (imatch_tpu/utils/profiles.py)."""

import pytest

from imatch_tpu.utils.profiles import PROFILES, apply_profile


def test_no_profile_is_noop():
    env = {"IMATCH_MD_SEG": "8"}
    assert apply_profile(env) == {}
    assert env == {"IMATCH_MD_SEG": "8"}


def test_latency_profile_sets_group():
    env = {"IMATCH_PROFILE": "latency"}
    applied = apply_profile(env)
    assert applied["IMATCH_MD_SEG"] == "2"
    assert env["IMATCH_INDEX_ENGINE"] == "auto"
    assert env["IMATCH_WARMUP"] == "1"


def test_explicit_env_beats_profile():
    env = {"IMATCH_PROFILE": "latency", "IMATCH_MD_SEG": "4"}
    applied = apply_profile(env)
    assert "IMATCH_MD_SEG" not in applied
    assert env["IMATCH_MD_SEG"] == "4"
    # the rest of the group still lands
    assert env["IMATCH_INDEX_ENGINE"] == "auto"


def test_capacity_profile_turns_on_int8_tiers():
    env = {"IMATCH_PROFILE": "capacity"}
    apply_profile(env)
    assert env["IMATCH_SCORE_DTYPE"] == "int8"
    assert env["IMATCH_MD_QUANT"] == "int8"
    assert env["IMATCH_MD_CACHE"] == "int8"


def test_unknown_profile_raises():
    with pytest.raises(ValueError, match="unknown profile"):
        apply_profile({"IMATCH_PROFILE": "turbo"})


def test_profile_name_case_insensitive():
    env = {"IMATCH_PROFILE": " Throughput "}
    apply_profile(env)
    assert env["IMATCH_MD_SEG"] == "0"


def test_every_profile_key_is_documented_env_var():
    # keep the presets in the IMATCH_* namespace so README's table governs
    for name, group in PROFILES.items():
        for key in group:
            assert key.startswith("IMATCH_"), (name, key)


def test_unblessed_quant_profiles_warn(caplog):
    """throughput/capacity enable int8/W8A8 tiers whose WEIGHTS.md §5
    quality gates cannot run without real checkpoints — the startup log
    must say so loudly, naming the flags, until the operator confirms
    the blessing with IMATCH_QUANT_BLESSED=1."""
    import logging

    for name in ("throughput", "capacity"):
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="imatch.profiles"):
            apply_profile({"IMATCH_PROFILE": name})
        warns = [r for r in caplog.records if r.levelno == logging.WARNING]
        assert warns, name
        msg = warns[0].getMessage()
        assert "WEIGHTS.md" in msg and "IMATCH_QUANT_BLESSED" in msg
        assert "IMATCH_EMBED_QUANT" in msg

    # blessed marker silences it
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="imatch.profiles"):
        apply_profile(
            {"IMATCH_PROFILE": "capacity", "IMATCH_QUANT_BLESSED": "1"}
        )
    assert not [r for r in caplog.records if r.levelno == logging.WARNING]

    # latency enables no quantized tier — no warning
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="imatch.profiles"):
        apply_profile({"IMATCH_PROFILE": "latency"})
    assert not [r for r in caplog.records if r.levelno == logging.WARNING]


def test_profile_md_act_degrades_when_quant_overridden():
    """Explicit IMATCH_MD_QUANT != int8 must not turn a profile's
    IMATCH_MD_ACT=int8 into a startup crash — the profile drops the
    dependent flag instead (per-flag overrides degrade gracefully)."""
    env = {"IMATCH_PROFILE": "throughput", "IMATCH_MD_QUANT": "bf16"}
    applied = apply_profile(env)
    assert "IMATCH_MD_ACT" not in env
    assert "IMATCH_MD_ACT" not in applied
    assert env["IMATCH_MD_QUANT"] == "bf16"  # untouched
    # a user-set MD_ACT conflict is NOT silently dropped (the runtime
    # raises on it — that conflict is the user's to resolve)
    env = {
        "IMATCH_PROFILE": "throughput",
        "IMATCH_MD_QUANT": "bf16",
        "IMATCH_MD_ACT": "int8",
    }
    apply_profile(env)
    assert env["IMATCH_MD_ACT"] == "int8"
