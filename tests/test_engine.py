import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pdf_table_tpu.engine import InferTask, TaskConfig, bucket_batch_size
from pdf_table_tpu.parallel import (
    make_mesh,
    pad_to_multiple,
    replicate_params,
    shard_batch,
)


class DoublerTask(InferTask):
    task_name = "doubler"

    def _build_model(self):
        params = {"w": jnp.asarray(2.0)}

        def apply_fn(p, batch):
            return batch["x"] * p["w"]

        return apply_fn, params

    def _preprocess(self, inputs):
        arr = np.stack(inputs).astype(np.float32)
        padded, n = self.pad_batch({"x": arr})
        return padded, {"n": n}

    def _postprocess(self, raw, meta):
        return np.asarray(raw)[: meta["n"]]


class TestBuckets:
    def test_bucket_sizes(self):
        assert bucket_batch_size(1) == 1
        assert bucket_batch_size(3) == 4
        assert bucket_batch_size(8) == 8
        assert bucket_batch_size(100) == 128
        assert bucket_batch_size(200) == 256


class TestInferTask:
    def test_three_stage_call(self):
        task = DoublerTask()
        out = task(np.ones((3, 4), np.float32))
        assert out.shape == (3, 4)
        np.testing.assert_allclose(out, 2.0)
        assert len(task.timings["total"]) == 1
        summary = task.timing_summary()
        assert summary["infer"]["count"] == 1

    def test_ensure_built_commits_numpy_params(self):
        """Checkpoint-restored params are host numpy; ensure_built must
        device_put them ONCE, or every jitted call re-uploads the tree
        (on the tunneled TPU this tripled the det forward wall: ~90 ms
        of per-call param copy-starts vs ~24 ms of XLA module time)."""

        class NumpyParamsTask(DoublerTask):
            def _build_model(self):
                fn, _ = super()._build_model()
                return fn, {"w": np.asarray(2.0, np.float32)}

        task = NumpyParamsTask()
        task.ensure_built()
        assert isinstance(task._params["w"], jax.Array)
        out = task(np.ones((2, 4), np.float32))
        np.testing.assert_allclose(out, 2.0)

    def test_jit_cache_reuse(self):
        task = DoublerTask()
        task(np.ones((3, 4), np.float32))
        task(np.ones((4, 4), np.float32))   # same bucket (4)
        assert len(task._jitted) == 1
        task(np.ones((5, 4), np.float32))   # bucket 8
        assert len(task._jitted) == 2


class TestMesh:
    def test_make_mesh(self, cpu_mesh):
        assert cpu_mesh.shape["dp"] == 8

    def test_shard_batch_and_run(self, cpu_mesh):
        x = np.arange(24, dtype=np.float32).reshape(12, 2)
        (sharded,), n = shard_batch((x,), cpu_mesh)
        assert n == 12
        assert sharded.shape == (16, 2)  # padded to multiple of 8
        params = replicate_params({"w": jnp.asarray(3.0)}, cpu_mesh)

        @jax.jit
        def f(p, x):
            return x * p["w"]

        out = np.asarray(f(params, sharded))[:n]
        np.testing.assert_allclose(out, x * 3.0)

    def test_pad_to_multiple(self):
        a = np.ones((5, 3))
        out = pad_to_multiple(a, 8)
        assert out.shape == (8, 3)
        assert out[5:].sum() == 0
        assert pad_to_multiple(a, 5).shape == (5, 3)

    def test_sharded_matmul_collective(self, cpu_mesh):
        # psum across the dp axis via shard_map: per-device partial sums
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        x = np.ones((8, 4), np.float32)
        (xs,), _ = shard_batch((x,), cpu_mesh)

        def local_sum(xl):
            return jax.lax.psum(jnp.sum(xl), axis_name="dp")

        f = shard_map(local_sum, mesh=cpu_mesh, in_specs=P("dp", None),
                      out_specs=P())
        total = np.asarray(jax.jit(f)(xs))
        assert total == pytest.approx(32.0)
