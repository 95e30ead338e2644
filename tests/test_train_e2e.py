"""End-to-end training integration test on the hermetic synthetic scene."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from ibgs_tpu.config import ModelParams, OptimizationParams, PipelineParams
from ibgs_tpu.data.synthetic import make_synthetic_scene
from ibgs_tpu.train.loop import train


@pytest.mark.slow
def test_training_improves_psnr(tmp_path):
    scene = make_synthetic_scene(n_views=8, width=48, height=48,
                                 n_gt=600, n_seed=200)
    opt = OptimizationParams(
        iterations=50, densify_from_iter=15, densification_interval=20,
        densify_until_iter=45, opacity_reset_interval=10_000,
        single_view_weight_from_iter=25, multi_view_weight_from_iter=25,
        use_color_aggregation=True, start_color_aggregation_iter=35,
        color_aggregate_burnin_steps=10, number_src_frames=3,
        nb_visible_src_frames=2, position_lr_max_steps=50,
    )
    pipe = PipelineParams(backend="oracle", instance_cap=1 << 14)
    state, stacks = train(
        scene, ModelParams(sh_degree=1), opt, pipe,
        model_path=str(tmp_path), save_iterations=(50,), log_every=10,
        quiet=True,
    )
    import json
    log = [json.loads(l) for l in
           open(os.path.join(tmp_path, "train_log.jsonl"))]
    first, last = log[0], log[-1]
    assert np.isfinite(last["image_loss"])
    assert last["psnr"] > first["psnr"] + 2.0, (first, last)
    # densification ran and model stayed alive
    assert int(state.model.n_alive) >= 200
    # PLY snapshot was written and loads back
    ply_path = os.path.join(tmp_path, "point_cloud", "iteration_50",
                            "point_cloud.ply")
    assert os.path.exists(ply_path)
    from ibgs_tpu.data.ply import load_gaussian_ply
    d = load_gaussian_ply(ply_path)
    assert d["xyz"].shape[0] == int(state.model.n_alive)
    # depth cache was populated during the geo phase
    assert float(jnp.abs(stacks["depths"]).sum()) > 0


def test_staircase_row_cap_overflow_grows(tmp_path, capsys):
    """With staircase binning in the trainer (PipelineParams.staircase_cull)
    a too-small row_cap must grow + recompile, mirroring instance_cap."""
    scene = make_synthetic_scene(n_views=4, width=32, height=32,
                                 n_gt=300, n_seed=150)
    opt = OptimizationParams(
        iterations=2, use_color_aggregation=False,
        single_view_weight_from_iter=10_000,
        multi_view_weight_from_iter=10_000,
        number_src_frames=2, position_lr_max_steps=10)
    pipe = PipelineParams(backend="oracle", instance_cap=1 << 14,
                          staircase_cull=True, row_cap=16)
    train(scene, ModelParams(sh_degree=0), opt, pipe,
          model_path=str(tmp_path), save_iterations=(), test_iterations=(),
          log_every=1, quiet=True)
    out = capsys.readouterr().out
    assert "staircase rows" in out and "growing" in out, out


def test_instance_cap_overflow_grows(tmp_path, capsys):
    """An overflowing tile-instance count must trigger a cap growth +
    recompile instead of silently truncating the deepest Gaussians
    (VERDICT r1: binning.py drops instances past instance_cap)."""
    scene = make_synthetic_scene(n_views=4, width=32, height=32,
                                 n_gt=300, n_seed=150)
    opt = OptimizationParams(
        iterations=2, use_color_aggregation=False,
        single_view_weight_from_iter=10_000,
        multi_view_weight_from_iter=10_000,
        number_src_frames=2, position_lr_max_steps=10)
    # staircase off: row-cap truncation caps the REPORTED instance total,
    # so with both caps tiny the loop grows rows first and instances on a
    # later check (staged growth) — this test pins the instance mechanism
    pipe = PipelineParams(backend="oracle", instance_cap=64,
                          staircase_cull=False)
    train(scene, ModelParams(sh_degree=0), opt, pipe,
          model_path=str(tmp_path), save_iterations=(), test_iterations=(),
          log_every=1, quiet=True)
    out = capsys.readouterr().out
    assert "exceed" in out and "growing cap" in out, out


def test_densify_spike_grows_cap_next_step(tmp_path, capsys):
    """A mid-interval densify spike must trigger cap growth on the very
    next step, not at the next 100-iter poll (VERDICT r3 #8).  Two-phase:
    a calibration run records the instance trajectory, then a second run
    sets instance_cap between the pre- and post-densify counts and the
    growth warning must land exactly one step after the densify."""
    def run(cap):
        scene = make_synthetic_scene(n_views=4, width=32, height=32,
                                     n_gt=300, n_seed=150)
        opt = OptimizationParams(
            iterations=6, densify_from_iter=2, densification_interval=4,
            densify_until_iter=6, opacity_reset_interval=10_000,
            use_color_aggregation=False,
            densify_grad_threshold=1e-12, densify_abs_grad_threshold=1e-12,
            single_view_weight_from_iter=10_000,
            multi_view_weight_from_iter=10_000,
            number_src_frames=2, position_lr_max_steps=10)
        pipe = PipelineParams(backend="oracle", instance_cap=cap,
                              staircase_cull=False)
        path = str(tmp_path / f"cap{cap}")
        train(scene, ModelParams(sh_degree=0), opt, pipe,
              model_path=path, save_iterations=(), test_iterations=(),
              log_every=1, quiet=True)
        import json
        return [json.loads(l) for l in
                open(os.path.join(path, "train_log.jsonl"))]

    log = run(1 << 14)
    inst = {m["iter"]: m["n_instances"] for m in log}
    # densify runs after the step at it=4 → the spike shows at it=5
    assert inst[5] > max(inst[i] for i in (1, 2, 3, 4)), inst
    cap = max(inst[i] for i in (1, 2, 3, 4))
    capsys.readouterr()
    run(cap)
    out = capsys.readouterr().out
    assert "[it 5] WARNING: tile instances" in out and "growing cap" in out, \
        out


def test_debug_mode_dumps_snapshot_on_nonfinite(tmp_path):
    """PipelineParams.debug is the reference debug-machinery analog
    (diff_plane_rasterization/__init__.py:101-114 + train.py:367): the
    first non-finite step dumps the input pack and raises."""
    scene = make_synthetic_scene(n_views=4, width=32, height=32,
                                 n_gt=200, n_seed=100)
    # poison one gt image -> NaN loss at the first step touching it
    scene.images[:] = np.nan
    opt = OptimizationParams(
        iterations=4, use_color_aggregation=False,
        single_view_weight_from_iter=10_000,
        multi_view_weight_from_iter=10_000,
        number_src_frames=2, position_lr_max_steps=10)
    pipe = PipelineParams(backend="oracle", instance_cap=1 << 14,
                          debug=True)
    with pytest.raises(FloatingPointError, match="snapshot_fw"):
        train(scene, ModelParams(sh_degree=0), opt, pipe,
              model_path=str(tmp_path), save_iterations=(),
              test_iterations=(), log_every=1, quiet=True)
    snap = os.path.join(str(tmp_path), "snapshot_fw.npz")
    assert os.path.exists(snap)
    d = np.load(snap)
    assert d["xyz"].shape[1] == 3 and np.isfinite(d["xyz"]).all()


def test_pregrowth_fires_before_densify(tmp_path, capsys):
    """A model arriving at a densify event above 90% occupancy must grow
    capacity BEFORE the densify (loop.py pre-growth), so clone/split never
    run slot-starved near-full."""
    scene = make_synthetic_scene(n_views=4, width=32, height=32,
                                 n_gt=300, n_seed=150)
    opt = OptimizationParams(
        iterations=4, densify_from_iter=1, densification_interval=2,
        densify_until_iter=4, opacity_reset_interval=10_000,
        use_color_aggregation=False,
        single_view_weight_from_iter=10_000,
        multi_view_weight_from_iter=10_000,
        number_src_frames=2, position_lr_max_steps=10,
        # thresholds high: the densify itself adds ~nothing, so any
        # growth must come from the PRE-densify occupancy check
        densify_grad_threshold=1e9, densify_abs_grad_threshold=1e9)
    # 150 alive seeds in capacity 160 -> 93.75% occupancy at the event
    pipe = PipelineParams(backend="oracle", instance_cap=1 << 14)
    state, _ = train(
        scene, ModelParams(sh_degree=1, init_capacity=160), opt, pipe,
        model_path=str(tmp_path), save_iterations=(), log_every=10,
        quiet=True)
    out = capsys.readouterr().out
    assert "(pre-densify)" in out, out
    assert state.model.capacity == 320
    assert int(state.model.n_alive) >= 1
