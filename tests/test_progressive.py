"""Checkpoint/resume tests (SURVEY.md §5.4): progressive accumulation equals
one-shot rendering; a killed-and-resumed render is bit-identical."""
import numpy as np

from first_raytracer_tpu.render.api import render_image
from first_raytracer_tpu.render.progressive import (ProgressiveState,
                                                    progressive_render)
from first_raytracer_tpu.scene.builders import three_spheres


def test_progressive_matches_oneshot(tiny_three_spheres):
    scene, cam, cfg = tiny_three_spheres
    a = np.asarray(render_image(scene, cam, cfg, seed=0))
    b = progressive_render(scene, cam, cfg, seed=0, samples_per_batch=1)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_resume_after_kill(tmp_path, tiny_three_spheres):
    scene, cam, cfg = tiny_three_spheres
    ckpt = str(tmp_path / "render.ckpt.npz")

    # Simulate preemption after the first sample batch.
    class Stop(Exception):
        pass

    def killer(state):
        if state.samples_done == 1:
            state.save(ckpt)
            raise Stop

    try:
        progressive_render(scene, cam, cfg, seed=0, checkpoint_path=ckpt,
                           samples_per_batch=1, on_batch=killer)
        raise AssertionError("expected simulated preemption")
    except Stop:
        pass

    st = ProgressiveState.load(ckpt)
    assert st.samples_done == 1

    resumed = progressive_render(scene, cam, cfg, seed=0,
                                 checkpoint_path=ckpt, samples_per_batch=1)
    full = progressive_render(scene, cam, cfg, seed=0, samples_per_batch=1)
    np.testing.assert_array_equal(resumed, full)


def test_checkpoint_rejects_wrong_seed(tmp_path, tiny_three_spheres):
    scene, cam, cfg = tiny_three_spheres
    ckpt = str(tmp_path / "s.ckpt.npz")
    ProgressiveState.fresh(cfg, seed=3).save(ckpt)
    try:
        progressive_render(scene, cam, cfg, seed=4, checkpoint_path=ckpt)
        raise AssertionError("expected seed mismatch error")
    except ValueError:
        pass
