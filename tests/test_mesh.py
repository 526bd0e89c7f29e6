import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdwebui_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, MeshRuntime


def test_create_default():
    rt = MeshRuntime.create()
    assert rt.n_devices == jax.device_count()
    assert rt.model_size == 1


def test_create_4x2(runtime8):
    assert runtime8.data_size == 4
    assert runtime8.model_size == 2
    assert runtime8.mesh.axis_names == (DATA_AXIS, MODEL_AXIS)


def test_shard_batch_and_psum(runtime8):
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xs = runtime8.shard_batch(x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec(DATA_AXIS)

    @jax.jit
    def total(v):
        return jnp.sum(v)

    np.testing.assert_allclose(float(total(xs)), x.sum())


def test_pad_batch(runtime8):
    assert runtime8.pad_batch(1) == 4
    assert runtime8.pad_batch(4) == 4
    assert runtime8.pad_batch(5) == 8


def test_bad_model_axis():
    with pytest.raises(ValueError):
        MeshRuntime.create(model=3)
