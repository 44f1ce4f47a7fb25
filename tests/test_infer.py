"""Frame-coherent inference path (render/infer.py): compaction correctness
and compact-render parity with the full pipeline."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.test_cameras import IDENTITY_POSE, make_pinhole
from tests.test_gut_reference import random_scene
from threedgrut_tpu.render import gut, infer

RES = (64, 64)
CAM = make_pinhole(f=120.0, cx=32.0, cy=32.0)
CAP = 2048


def _scene(n=256, seed=5):
    return random_scene(n=n, seed=seed)


def test_compact_visible_stable_subset():
    pos, quat, scale, opa, feats = _scene()
    n = pos.shape[0]
    vis = np.zeros(n, bool)
    vis[[3, 7, 100, 200, 255]] = True
    sc = infer.compact_visible(pos, quat, scale, opa, feats,
                               jnp.asarray(vis), 8)
    assert int(sc.count) == 5 and not bool(sc.overflow)
    np.testing.assert_array_equal(np.asarray(sc.src_idx[:5]),
                                  [3, 7, 100, 200, 255])
    np.testing.assert_array_equal(
        np.asarray(sc.positions[:5]),
        np.asarray(pos)[np.array([3, 7, 100, 200, 255])])
    # Tail rows are dead (opacity 0 -> projector-invalid).
    assert float(jnp.max(sc.opacities[5:])) == 0.0
    # Overflow flagged when the visible set exceeds the static capacity.
    sc2 = infer.compact_visible(pos, quat, scale, opa, feats,
                                jnp.asarray(vis), 4)
    assert bool(sc2.overflow)


def test_render_compact_matches_full_when_all_visible():
    """With every contributing particle kept (threshold 0), the compact
    render at the SAME camera must match the full render exactly up to the
    compaction permutation (identity order -> bit-identical)."""
    pos, quat, scale, opa, feats = _scene()
    out_full, _ = gut.render(pos, quat, scale, opa, feats, CAM,
                             IDENTITY_POSE, RES, CAP, aux_gradients=False,
                             aux_outputs=False)
    _, _, scene = infer.refresh(pos, quat, scale, opa, feats, CAM,
                                IDENTITY_POSE, RES, CAP,
                                n_compact=pos.shape[0])
    out_c, ovf = infer.render_compact(scene, CAM, IDENTITY_POSE, RES, CAP)
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(out_c.rgb),
                               np.asarray(out_full.rgb), atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_c.opacity),
                               np.asarray(out_full.opacity), atol=2e-6)


def test_threshold_monotone_and_bounded_error():
    pos, quat, scale, opa, feats = _scene()
    out_full, _ = gut.render(pos, quat, scale, opa, feats, CAM,
                             IDENTITY_POSE, RES, CAP, aux_gradients=False,
                             aux_outputs=False)
    counts = []
    for t in (0.0, 1.0 / 255.0, 0.05):
        _, _, scene = infer.refresh(pos, quat, scale, opa, feats, CAM,
                                    IDENTITY_POSE, RES, CAP,
                                    n_compact=pos.shape[0],
                                    visibility_threshold=t)
        counts.append(int(scene.count))
        out_c, _ = infer.render_compact(scene, CAM, IDENTITY_POSE, RES, CAP)
        err = float(jnp.max(jnp.abs(out_c.rgb - out_full.rgb)))
        # Dropping only sub-threshold contributors keeps the image close;
        # generous bound (errors compound across dropped particles).
        assert err < 200.0 * t + 1e-5, (t, err)
    assert counts[0] >= counts[1] >= counts[2]
    assert counts[2] < counts[0]
