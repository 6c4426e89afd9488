"""Contamination-gate refusal pins (VERDICT r13 item 2): the committed
BENCH_r13 stamped itself ``contaminated: false`` while running uniformly
~39% slow under loadavg 3.4 — the pure-CPU calib kernel missed the load.
The r14 gate adds (a) a raw pre-session loadavg refusal and (b) a
reference-query probe in bench.py; these tests pin that a hot reading
cannot certify clean again."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import calib_gate


def test_loadavg_gate_refuses_hot_box(monkeypatch):
    """A 1-min loadavg above the threshold must retry then stamp
    contaminated — never silently pass."""
    monkeypatch.setattr(os, "getloadavg", lambda: (3.4, 3.0, 2.5))
    sleeps = []
    monkeypatch.setattr(calib_gate.time, "sleep", sleeps.append)
    stamp = calib_gate.loadavg_gate(max_load=2.0, retries=3, sleep_s=1.0)
    assert stamp["loadavg_contaminated"] is True
    assert stamp["loadavg_gate_retries"] == 3
    assert sleeps == [1.0, 1.0, 1.0]
    assert stamp["loadavg_gate_reading"] == 3.4


def test_loadavg_gate_passes_idle_box(monkeypatch):
    monkeypatch.setattr(os, "getloadavg", lambda: (0.5, 0.6, 0.7))
    stamp = calib_gate.loadavg_gate(max_load=2.0, retries=3)
    assert stamp["loadavg_contaminated"] is False
    assert stamp["loadavg_gate_retries"] == 0


def test_loadavg_gate_recovers_when_load_clears(monkeypatch):
    readings = iter([(3.0, 0, 0), (2.5, 0, 0), (1.0, 0, 0)])
    monkeypatch.setattr(os, "getloadavg", lambda: next(readings))
    monkeypatch.setattr(calib_gate.time, "sleep", lambda _s: None)
    stamp = calib_gate.loadavg_gate(max_load=2.0, retries=5, sleep_s=0)
    assert stamp["loadavg_contaminated"] is False
    assert stamp["loadavg_gate_retries"] == 2


def test_gated_calib_merges_loadavg_contamination(monkeypatch):
    """gated_calib must OR the raw-loadavg refusal into ``contaminated``
    even when the CPU probe itself lands in band (the exact r13 hole)."""
    monkeypatch.setattr(os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    monkeypatch.setattr(calib_gate.time, "sleep", lambda _s: None)
    monkeypatch.setattr(calib_gate, "calibrate", lambda _spark: 0.1)  # in band
    stamp = calib_gate.gated_calib(spark=None, band=0.45, retries=1, sleep_s=0)
    assert stamp["calib_warm_sec"] == 0.1  # CPU probe clean...
    assert stamp["contaminated"] is True  # ...but the artifact is not
    assert stamp["loadavg_contaminated"] is True


def test_bench_certify_ors_every_gate():
    """bench.py's certification must OR all five gates — a hot reading
    on ANY of them (CPU probe either end, raw loadavg, ref probe either
    end) forbids a clean stamp."""
    import bench

    assert bench._REF_PROBE_QUERY in bench.REGISTRY
    clean_load = {"loadavg_contaminated": False}
    hot_load = {"loadavg_contaminated": True}
    ok = dict(contaminated_before=False, calib_after=0.2,
              loadavg_stamp=clean_load, ref_before=0.5, ref_after=0.5)
    assert bench._certify(**ok) is False
    assert bench._certify(**{**ok, "contaminated_before": True}) is True
    assert bench._certify(**{**ok, "calib_after": 9.0}) is True
    assert bench._certify(**{**ok, "loadavg_stamp": hot_load}) is True
    assert bench._certify(**{**ok, "ref_before": 1.4}) is True
    assert bench._certify(**{**ok, "ref_after": 1.4}) is True
    # r14-opt band tightening (0.9 -> 0.7): the Aug-18 5x-slow epoch read
    # ref probes 0.727/0.888 with the CPU calib in band and certified
    # clean under the old band — those readings must now contaminate
    assert bench._REF_PROBE_BAND_S <= 0.7
    assert bench._certify(**{**ok, "ref_before": 0.727}) is True
    assert bench._certify(**{**ok, "ref_after": 0.888}) is True
