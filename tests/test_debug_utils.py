"""Field dump / profile utilities (the DEBUG_FIELD product) and device
report."""

import numpy as np

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu.fields import debug
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox
from mri_nanoparticle_simulation_tpu.utils.device_info import device_report


def test_dump_field_csv(tmp_path):
    p = P.small_test_params(num_cells=6)
    sc = BacteriaBox(p, seed=4).populate()
    path = str(tmp_path / "field.csv")
    debug.dump_field_csv(sc.mnps, p, path, grid_n=8)
    data = np.loadtxt(path, delimiter=",")
    assert data.shape == (512, 4)
    assert np.isfinite(data).all()
    # dipole fields must actually be present (nonzero somewhere)
    assert np.abs(data[:, 3]).max() > 0


def test_field_profile():
    p = P.small_test_params(num_cells=6)
    sc = BacteriaBox(p, seed=4).populate()
    prof = debug.field_profile(sc.mnps, p, [0.5, 0.5, 0.5],
                               [7.5, 7.5, 7.5], n=64)
    assert prof.shape == (64, 2)
    assert np.isfinite(prof).all()
    assert prof[-1, 0] > prof[0, 0]


def test_device_report():
    text = device_report()
    assert "device 0" in text and "jax" in text
