"""ICM binary codec round-trip and parity with reference-produced files."""

from pathlib import Path

import numpy as np
import pytest

from glimmer_mg_tpu.models import icm as icm_mod

GOLDEN_ICM = Path("/root/reference/sample-run/glimmer3/results/NC_000915.icm")
GOLDEN_GICM = Path("/root/reference/sample-run/glimmer3/results/NC_000915.run1.gicm")


@pytest.mark.parametrize("path", [GOLDEN_ICM, GOLDEN_GICM])
def test_read_golden(path):
    if not path.exists():
        pytest.skip("golden file unavailable")
    m = icm_mod.read_icm(path)
    assert m.model_len == 12
    assert m.model_depth == 7
    assert m.periodicity == 3
    assert m.num_nodes == icm_mod.num_tree_nodes(7) == 21845
    # Root of every frame must be a real node
    assert (m.mip[:, 0] >= -1).all()
    # All probs of surviving nodes are log-probabilities (<= 0)
    alive = m.mip >= -1
    assert (m.probs[alive] <= 0.0).all()


def test_roundtrip(tmp_path):
    if not GOLDEN_ICM.exists():
        pytest.skip("golden file unavailable")
    m = icm_mod.read_icm(GOLDEN_ICM)
    out = tmp_path / "rt.icm"
    icm_mod.write_icm(m, out)
    # Byte-identical round trip (header text included)
    assert out.read_bytes() == GOLDEN_ICM.read_bytes()


def test_roundtrip_preserves_pruned(tmp_path):
    m = icm_mod.ICM.empty(model_len=6, depth=2, periodicity=2)
    m.mip[:, 0] = 1
    m.mip[0, 1:5] = [-1, 2, -2, -1]
    m.mip[1, 1:5] = [-2, -2, -1, 0]
    m.mip[:, 5:] = -2
    m.mip[0, 9] = -1  # child of node 2
    rng = np.random.default_rng(0)
    m.probs = np.where(
        (m.mip >= -1)[..., None], np.log(rng.random(m.probs.shape)), 0.0
    ).astype(np.float32)
    p = tmp_path / "x.icm"
    icm_mod.write_icm(m, p)
    m2 = icm_mod.read_icm(p)
    assert m2.model_len == 6 and m2.periodicity == 2
    np.testing.assert_array_equal(m.mip, m2.mip)
    np.testing.assert_array_equal(
        np.where((m.mip >= -1)[..., None], m.probs, 0.0),
        m2.probs,
    )
