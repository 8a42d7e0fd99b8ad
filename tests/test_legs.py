"""Engine-leg resolution: per-leg Ozaki budget selection and the loud
fallback note (round-2 VERDICT: the nk=512 fast-path fallback was
silent)."""

import dataclasses

from redtime_tpu import fastpt
from redtime_tpu.config import SolverConfig


def test_default_budget_admits_all_legs_nk128():
    assert fastpt._oz_enabled(SolverConfig()) == {"out", "tab", "pz",
                                                  "fwd"}


def test_default_budget_admits_all_legs_nk512():
    """The HIGH_ACCURACY grid's packs (~2.6 GB) fit the auto budget —
    the round-2 silent 650x cliff is gone."""
    cfg = SolverConfig.high_accuracy()
    b = fastpt._oz_leg_bytes(cfg)
    assert sum(b.values()) < fastpt.OZ_AUTO_BUDGET
    assert fastpt._oz_enabled(cfg) == {"out", "tab", "pz", "fwd"}


def test_tiny_budget_drops_auto_legs():
    cfg = SolverConfig(oz_budget_bytes=1)
    assert fastpt._oz_enabled(cfg) == frozenset()


def test_forced_leg_survives_budget():
    cfg = SolverConfig(oz_budget_bytes=1, tab_leg="ozaki")
    assert fastpt._oz_enabled(cfg) == {"tab"}


def test_greedy_priority_order():
    """'auto' legs enable in measured-benefit order (out > tab > pz >
    fwd) while they fit the budget."""
    cfg = SolverConfig()
    b = fastpt._oz_leg_bytes(cfg)
    budget = b["out"] + b["tab"] + b["pz"] // 2
    cfg2 = dataclasses.replace(cfg, oz_budget_bytes=budget)
    enabled = fastpt._oz_enabled(cfg2)
    assert "out" in enabled and "tab" in enabled
    assert "pz" not in enabled
    # fwd may still fit in the leftover only if smaller than pz's gap
    if b["fwd"] <= budget - b["out"] - b["tab"]:
        assert "fwd" in enabled


def test_resolved_legs_cpu_is_dot():
    res = fastpt.resolved_legs(SolverConfig(), mode="fft")
    assert res["out"] == res["tab"] == res["pz"] == res["fwd"] == "dot"
    assert res["fft"] == "fft"
    assert res["asm"] == "direct"


def test_resolved_legs_tpu_matmul(monkeypatch):
    monkeypatch.setattr(fastpt, "_target_platform", lambda: "tpu")
    res = fastpt.resolved_legs(SolverConfig(), mode="matmul")
    assert res["out"] == res["tab"] == res["pz"] == res["fwd"] == "ozaki"
    res = fastpt.resolved_legs(SolverConfig(oz_budget_bytes=1),
                               mode="matmul")
    assert res["out"] == "dot"


def test_fallback_note_fires_once(monkeypatch, capsys):
    monkeypatch.setattr(fastpt, "_target_platform", lambda: "tpu")
    cfg = SolverConfig(oz_budget_bytes=2)  # unique key; drops every leg
    fastpt._note_leg_resolution(cfg, "matmul")
    err = capsys.readouterr().err
    assert "DISENGAGED" in err and "out" in err
    assert "oz_budget_bytes" in err
    # second call with the same key is silent
    fastpt._note_leg_resolution(cfg, "matmul")
    assert capsys.readouterr().err == ""


def test_no_note_when_fast_path_engaged(monkeypatch, capsys):
    monkeypatch.setattr(fastpt, "_target_platform", lambda: "tpu")
    fastpt._note_leg_resolution(SolverConfig(oz_budget_bytes=3 * 10 ** 9),
                                "matmul")
    assert capsys.readouterr().err == ""


def test_no_note_on_cpu(capsys):
    fastpt._note_leg_resolution(SolverConfig(oz_budget_bytes=4), "matmul")
    assert capsys.readouterr().err == ""


def test_no_note_for_explicit_f32_engine(monkeypatch, capsys):
    monkeypatch.setattr(fastpt, "_target_platform", lambda: "tpu")
    fastpt._note_leg_resolution(
        SolverConfig(oz_budget_bytes=5,
                     engine_transform_dtype="float32"), "matmul")
    assert capsys.readouterr().err == ""
