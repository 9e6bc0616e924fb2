"""Artifact hygiene layer (utils/artifacts.py): the measurement-side
analogue of the reference's always-on invariant checks
(renumber.cu:123-149) — harnesses must not commit impossible values."""

import json

import pytest

from gcn_tpu.utils.artifacts import (ArtifactError, validate_artifact,
                                     write_artifact)


def test_clean_artifact_passes_and_is_stamped(tmp_path):
    p = tmp_path / "r.json"
    out = write_artifact(str(p), {"warm_step_ms": 12.3, "eff_hier": 0.91},
                         harness="t.py", schema="v1")
    assert out["_meta"] == {"harness": "t.py", "schema": "v1"}
    on_disk = json.loads(p.read_text())
    assert on_disk["warm_step_ms"] == 12.3
    assert on_disk["_meta"]["schema"] == "v1"


def test_negative_duration_refused(tmp_path):
    with pytest.raises(ArtifactError, match="compile_s"):
        write_artifact(str(tmp_path / "r.json"),
                       {"rows": [{"compile_s": -13.4}]},
                       harness="t.py", schema="v1")
    assert not (tmp_path / "r.json").exists()


def test_fraction_and_pct_bounds():
    bad = validate_artifact({"eff_flat": 1.7, "pad_fraction": -0.2,
                             "roofline_pct": 104.0})
    assert {p for p, _, _ in bad} == {"eff_flat", "pad_fraction",
                                      "roofline_pct"}
    assert validate_artifact({"eff_flat": 1.0, "pad_fraction": 0.0,
                              "roofline_pct": 89.3}) == []


def test_nan_refused_and_allowlist_respected():
    assert validate_artifact({"warm_step_ms": float("nan")})
    # signed deltas are legitimate when explicitly exempted
    assert validate_artifact({"delta_ms": -2.0}, allow=["delta_ms"]) == []
    assert validate_artifact({"delta_ms": -2.0}) != []


def test_nested_paths_reported():
    bad = validate_artifact({"rows": [{"a_ms": 1.0}, {"a_ms": -1.0}]})
    assert len(bad) == 1 and bad[0][0] == "rows[1].a_ms"


def test_word_stems_do_not_false_positive():
    # round-4 regression: 'effective'/'gbps' stems are NOT efficiencies
    assert validate_artifact({"gather_effective_gbps_mid": 252.5,
                              "stream_gbps": 600.0}) == []


def test_nested_eff_dicts_are_validated():
    # eff dicts keyed by bandwidth scale: values judged by the dict name
    assert validate_artifact({"rows": [{"eff": {"0.5": 0.8,
                                                "1.0": 1.0}}]}) == []
    bad = validate_artifact({"rows": [{"eff": {"1.0": 1.7}}]})
    assert len(bad) == 1 and "eff" in bad[0][0]
