"""Mesh construction tests on the 8-virtual-device CPU platform."""

import jax
import pytest

from diffusion_pipe_tpu import mesh as mesh_lib


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_default_mesh_all_data():
    m = mesh_lib.make_mesh()
    assert mesh_lib.data_parallel_size(m) == 8
    assert mesh_lib.num_stages(m) == 1


def test_dp_pp_tp_mesh():
    m = mesh_lib.make_mesh(pipeline_stages=2, tensor_parallel=2)
    assert mesh_lib.data_parallel_size(m) == 2
    assert m.shape == {"data": 2, "stage": 2, "tensor": 2}


def test_indivisible_raises():
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(pipeline_stages=3)
