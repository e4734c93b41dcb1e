"""Mesh / sharding helper tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo_tpu.parallel import (batch_sharding, create_mesh, replicate_tree,
                               shard_batch)


def test_create_mesh_shapes():
    m = create_mesh(data_parallel=8)
    assert m.shape == {"data": 8, "model": 1}
    m2 = create_mesh(data_parallel=4, spatial_parallel=2)
    assert m2.shape == {"data": 4, "model": 2}
    m3 = create_mesh(data_parallel=-1, spatial_parallel=2)
    assert m3.shape["data"] == jax.device_count() // 2


def test_create_mesh_too_many_devices():
    with pytest.raises(ValueError):
        create_mesh(data_parallel=jax.device_count() + 1)


def test_shard_batch_places_leading_axis():
    mesh = create_mesh(data_parallel=8)
    batch = {"img": np.zeros((8, 4, 4, 3), np.float32),
             "label": np.zeros((8, 4, 4), np.int32),
             "name": ["x"] * 8}
    out = shard_batch(batch, mesh)
    assert out["name"] == batch["name"]  # host data passes through
    sh = out["img"].sharding
    assert sh.spec == batch_sharding(mesh).spec
    # each device holds 1/8 of the batch
    assert out["img"].addressable_shards[0].data.shape[0] == 1


def test_replicate_tree():
    mesh = create_mesh(data_parallel=8)
    tree = {"w": jnp.ones((4, 4))}
    rep = replicate_tree(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_global_batch_psum_equals_local_sum():
    """The compiled psum over the data axis replaces the reference's
    all_gather+sum metric reduction (train_learners.py:130-165)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = create_mesh(data_parallel=8)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def total(v):
        return jnp.sum(v, axis=0)

    np.testing.assert_allclose(np.asarray(total(xs)), x.sum(0))


@pytest.mark.parametrize("pur_type,unc_type", [
    ("radius", "entropy"),
    ("ripu", "pixel_entropy"),
])
def test_spatial_region_score_matches_unsharded(pur_type, unc_type):
    """Scoring with H sharded over the model axis (TPU.SPATIAL_PARALLEL)
    must reproduce the single-device program: GSPMD's halo exchange
    feeds the box filters the same operands, and min/max normalization
    is order-free (SURVEY.md §5 spatial-sharding note). Tolerance is
    f32 ULP: the partitioned graph may fuse (and so place FMAs)
    differently than the unsharded one — observed max 4e-7 relative."""
    from halo_tpu.active.scoring import (floating_region_score,
                                         spatial_region_score)

    mesh = create_mesh(data_parallel=2, spatial_parallel=4)
    H, W, C, E = 64, 48, 19, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    logits = jax.random.normal(k1, (H, W, C), jnp.float32)
    embed = jax.random.normal(k2, (H, W, E), jnp.float32) * 0.3

    want = floating_region_score(
        logits, embed, unc_type=unc_type, pur_type=pur_type, size=3,
        num_classes=C, normalize=True)
    got = spatial_region_score(
        logits, embed, mesh=mesh, unc_type=unc_type, pur_type=pur_type,
        size=3, num_classes=C, normalize=True)
    for g, w in zip(got, want):
        assert g.sharding.spec == jax.sharding.PartitionSpec("model")
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=0, atol=1e-6)


def test_spatial_region_score_rejects_indivisible_h():
    from halo_tpu.active.scoring import spatial_region_score
    mesh = create_mesh(data_parallel=2, spatial_parallel=4)
    with pytest.raises(ValueError):
        spatial_region_score(jnp.zeros((30, 16, 19)), jnp.zeros((30, 16, 8)),
                             mesh=mesh)
