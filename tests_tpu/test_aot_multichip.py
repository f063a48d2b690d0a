"""AOT multi-chip compile checks against a real TPU topology.

The multichip dryrun executes on a virtual CPU mesh; CPU interpret mode
provably hides Mosaic lowering bugs (DESIGN.md item 25). These tests compile
the production sharded programs — the (2,2,2) dp x sp x tp ZeRO-3 train
step and the TP=2/4 cached serving decode — against a ``v5e:2x4`` topology
descriptor with the REAL TPU compiler, so any Mosaic kernel lowering,
layout, or SPMD partitioning regression fails here without needing 8
physical chips. First run compiles (~5 min total); the persistent cache
makes reruns fast.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import aot_check


def test_aot_train_dp_sp_tp():
    out = aot_check.aot_train_leg()
    assert out["flops_per_step"] and out["flops_per_step"] > 0


def test_aot_decode_tp2():
    out = aot_check.aot_decode_leg(2)
    assert out["flops"] and out["flops"] > 0


def test_aot_decode_tp4():
    out = aot_check.aot_decode_leg(4)
    assert out["flops"] and out["flops"] > 0


def test_aot_train_multihost_v5e16():
    """Same train step compiled for 16 chips over FOUR hosts (v5e:4x4):
    exercises the multi-host partitioning/collective compile paths."""
    out = aot_check.aot_train_leg(4, 2, 2, topology="v5e:4x4")
    assert out["flops_per_step"] and out["flops_per_step"] > 0


def test_aot_pp_train():
    """(4, pipe=2) GPipe train step — the ppermute pipeline ring compiled
    by the real TPU compiler (the dryrun covers CPU-interpret only)."""
    out = aot_check.aot_pp_train_leg()
    assert out["flops_per_step"] and out["flops_per_step"] > 0
