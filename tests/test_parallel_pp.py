"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatch pipeline
over a pp mesh axis matches sequential stage application, forward and
backward (the reference has no pipeline story — single cuda:0 device,
base_infer_task.py:69)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pdf_table_tpu.parallel.pipeline import (gpipe_apply, sequential_apply)


def mlp_stage(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


@pytest.fixture(scope="module")
def pp_mesh():
    devices = np.array(jax.devices("cpu")[:4])
    return Mesh(devices, axis_names=("pp",))


@pytest.fixture(scope="module")
def stack():
    rng = np.random.default_rng(0)
    L, D, Hd = 4, 16, 24
    params = {
        "w1": jnp.asarray(rng.normal(size=(L, D, Hd)) * 0.3, jnp.float32),
        "b1": jnp.asarray(rng.normal(size=(L, Hd)) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(L, Hd, D)) * 0.3, jnp.float32),
        "b2": jnp.asarray(rng.normal(size=(L, D)) * 0.1, jnp.float32),
    }
    mb = jnp.asarray(rng.normal(size=(6, 5, D)), jnp.float32)  # M=6, mb=5
    return params, mb


class TestGPipe:
    def test_forward_matches_sequential(self, pp_mesh, stack):
        params, mb = stack
        want = sequential_apply(mlp_stage, params, mb)
        got = gpipe_apply(mlp_stage, params, mb, pp_mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_more_microbatches_than_stages(self, pp_mesh, stack):
        params, _ = stack
        rng = np.random.default_rng(1)
        mb = jnp.asarray(rng.normal(size=(9, 3, 16)), jnp.float32)
        want = sequential_apply(mlp_stage, params, mb)
        got = gpipe_apply(mlp_stage, params, mb, pp_mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_matches_sequential(self, pp_mesh, stack):
        params, mb = stack
        tgt = jnp.ones_like(mb)

        def loss_pp(p):
            y = gpipe_apply(mlp_stage, p, mb, pp_mesh)
            return jnp.mean((y - tgt) ** 2)

        def loss_seq(p):
            y = sequential_apply(mlp_stage, p, mb)
            return jnp.mean((y - tgt) ** 2)

        g_pp = jax.grad(loss_pp)(params)
        g_seq = jax.grad(loss_seq)(params)
        for k in params:
            np.testing.assert_allclose(np.asarray(g_pp[k]),
                                       np.asarray(g_seq[k]),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=k)

    def test_jit_under_mesh(self, pp_mesh, stack):
        params, mb = stack
        fn = jax.jit(lambda p, x: gpipe_apply(mlp_stage, p, x, pp_mesh))
        got = fn(params, mb)
        want = sequential_apply(mlp_stage, params, mb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestMultihostSharding:
    """parallel/multihost.py: corpus sharding math (SURVEY §5 distributed
    backend — DCN shards input, ICI carries collectives)."""

    def test_bounds_partition_exactly(self):
        from pdf_table_tpu.parallel.multihost import shard_bounds

        for n in (0, 1, 7, 8, 9, 100):
            for pc in (1, 2, 3, 8):
                spans = [shard_bounds(n, i, pc) for i in range(pc)]
                assert spans[0][0] == 0 and spans[-1][1] == n
                for (a, b), (c, d) in zip(spans, spans[1:]):
                    assert b == c  # contiguous, no gap/overlap
                sizes = [b - a for a, b in spans]
                assert max(sizes) - min(sizes) <= 1

    def test_shard_and_merge_roundtrip(self):
        from pdf_table_tpu.parallel.multihost import (merge_sharded_results,
                                                      shard_pages)

        pages = [f"p{i}" for i in range(11)]
        shards = [shard_pages(pages, i, 3) for i in range(3)]
        assert merge_sharded_results(shards) == pages

    def test_initialize_single_host(self):
        from pdf_table_tpu.parallel.multihost import initialize

        idx, cnt = initialize()
        assert idx == 0 and cnt >= 1
