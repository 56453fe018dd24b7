"""Orbax checkpoint/resume for the classifier trainer (SURVEY §5)."""

import numpy as np
import pandas as pd
import scipy.sparse as sp

import spatialcore_tpu as sct
from spatialcore_tpu.annotation import ensure_normalized, train_cell_type_model


def _ref(n_per=120, seed=0):
    rng = np.random.default_rng(seed)
    n = n_per * 3
    c = rng.poisson(1.0, (n, 24)).astype(np.float32)
    for t in range(3):
        c[t * n_per:(t + 1) * n_per, t * 6:t * 6 + 6] += rng.poisson(
            7.0, (n_per, 6))
    a = sct.SpatialData(X=sp.csr_matrix(c), obs=pd.DataFrame(
        {"cell_type": np.repeat(["A", "B", "C"], n_per)},
        index=[f"c{i}" for i in range(n)]))
    a.layers["counts"] = sp.csr_matrix(c)
    ensure_normalized(a)
    return a


def test_resume_matches_uninterrupted(tmp_path):
    a = _ref()
    full = train_cell_type_model(a, epochs=16, seed=0)
    ck = tmp_path / "ck"
    train_cell_type_model(a, epochs=8, seed=0, checkpoint_dir=ck,
                          checkpoint_every=4)
    resumed = train_cell_type_model(a, epochs=16, seed=0,
                                    checkpoint_dir=ck, checkpoint_every=4,
                                    resume=True)
    np.testing.assert_allclose(resumed.W, full.W, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(resumed.b, full.b, rtol=1e-4, atol=1e-6)


def test_checkpointing_does_not_perturb_training(tmp_path):
    a = _ref(seed=1)
    plain = train_cell_type_model(a, epochs=10, seed=3)
    ckpt = train_cell_type_model(a, epochs=10, seed=3,
                                 checkpoint_dir=tmp_path / "ck2",
                                 checkpoint_every=3)
    np.testing.assert_allclose(plain.W, ckpt.W, rtol=1e-6)
