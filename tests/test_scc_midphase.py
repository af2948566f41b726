"""SCC mid-phase checkpoint/resume: kill inside fixpoints, resume bit-exact."""

import pytest

from linkgraph import LinkGraph, strongly_connected_components
from linkgraph.checkpoint import CheckpointManager


def _two_cycles(spark):
    # cycle A: a00→…→a11→a00 (12 nodes, min a00); cycle B: b0→…→b3→b0;
    # bridge a00→b0. Coloring paints EVERYTHING a00 (B is downstream), the
    # backward reach from the a00 pivot recovers only cycle A, so the run
    # needs two peel rounds — and the 12-long cycle forces ~12-superstep
    # color and reach fixpoints, deep enough to kill mid-phase.
    a = [f"a{i:02d}" for i in range(12)]
    b = [f"b{i}" for i in range(4)]
    edges = [(a[i], a[(i + 1) % 12]) for i in range(12)]
    edges += [(b[i], b[(i + 1) % 4]) for i in range(4)]
    edges += [("a00", "b0")]
    want = {x: "a00" for x in a} | {x: "b0" for x in b}
    return LinkGraph(spark.createDataFrame(edges, ["src", "dst"])), want


def _labels(df):
    return {r["id"]: r["scc"] for r in df.collect()}


def test_midphase_resume_ladder_bit_exact(spark, tmp_ckpt):
    g, want = _two_cycles(spark)
    ref = _labels(strongly_connected_components(g, strategy="distributed"))
    assert ref == want

    mgr = CheckpointManager(tmp_ckpt, spark)
    phases_seen = set()
    budget = 5
    out = None
    for _ in range(30):  # ladder: raise the global budget until completion
        try:
            out = strongly_connected_components(
                g,
                max_iter=budget,
                checkpoint=mgr,
                checkpoint_every_steps=2,
                resume=budget > 5,
            )
            break
        except RuntimeError:
            step = mgr.latest_step()
            assert step is not None, "killed run left no snapshot to resume"
            met = mgr.manifest(step)["metrics"]
            assert met["done"] is False
            phases_seen.add(met["phase"])
            budget += 5
    else:
        pytest.fail("ladder did not complete within 30 resumes")

    assert _labels(out) == ref
    # the ladder must actually have died INSIDE phases, not only at round
    # boundaries — both long fixpoints leave mid-phase snapshots
    assert "color" in phases_seen and "reach" in phases_seen


def test_midphase_color_snapshot_roundtrips_state(spark, tmp_ckpt):
    # single kill mid-color, one resume: exercises the load path for the
    # in-flight color table + fp without the ladder's repetition
    g, want = _two_cycles(spark)
    mgr = CheckpointManager(tmp_ckpt, spark)
    with pytest.raises(RuntimeError):
        strongly_connected_components(
            g, max_iter=7, checkpoint=mgr, checkpoint_every_steps=1
        )
    met = mgr.manifest(mgr.latest_step())["metrics"]
    assert met["phase"] == "color" and met["fp"] is not None
    out = strongly_connected_components(
        g, max_iter=200, checkpoint=mgr, checkpoint_every_steps=1, resume=True
    )
    assert _labels(out) == want
    # completed run finishes with a done snapshot; resuming again is a no-op
    # read of the final labels
    met2 = mgr.manifest(mgr.latest_step())["metrics"]
    assert met2["done"] is True
    again = strongly_connected_components(g, checkpoint=mgr, resume=True)
    assert _labels(again) == want


def test_round_granular_checkpoint_unchanged(spark, tmp_ckpt):
    # checkpoint WITHOUT checkpoint_every_steps: only round-boundary (and
    # done) snapshots exist — phase is always "trim"
    g, want = _two_cycles(spark)
    mgr = CheckpointManager(tmp_ckpt, spark)
    out = strongly_connected_components(
        g, checkpoint=mgr, checkpoint_interval=1
    )
    assert _labels(out) == want
    import json
    import os

    phases = []
    for d in sorted(os.listdir(tmp_ckpt)):
        if d.startswith("step="):
            with open(os.path.join(tmp_ckpt, d, "manifest.json")) as f:
                phases.append(json.load(f)["metrics"]["phase"])
    assert phases and all(p == "trim" for p in phases)
