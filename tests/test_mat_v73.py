"""MatReader v7.3 (HDF5) fallback path — the reference's is a latent
NameError (utilities3.py:5 commented h5py import)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from uno_tpu.data.mat import MatReader


def test_v73_read_with_axis_reversal(tmp_path):
    path = str(tmp_path / "v73.mat")
    a = np.arange(2 * 3 * 4, dtype=np.float64).reshape(2, 3, 4)
    # MATLAB v7.3 stores column-major; h5py writes C-order, so the reader's
    # transpose reproduces MatReader's axis reversal semantics
    with h5py.File(path, "w") as f:
        f.create_dataset("field", data=a)
    r = MatReader(path)
    assert r._h5, "expected the h5py fallback to engage on an HDF5 file"
    got = r.read_field("field")
    assert got.shape == (4, 3, 2)
    np.testing.assert_allclose(got, np.transpose(a, (2, 1, 0)))
