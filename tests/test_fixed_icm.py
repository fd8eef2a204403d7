"""Fixed-length ICM (build-fixed / score-fixed) parity."""

import subprocess

import numpy as np
import pytest

from glimmer_mg_tpu.models import dna, fixed_icm

from . import oracle


@pytest.fixture(scope="module")
def oracle_bin():
    if not oracle.available():
        pytest.skip("reference sources unavailable")
    return oracle.ensure_built()


def _ulp_compare(ours: bytes, theirs: bytes, max_frac=1e-3):
    assert len(ours) == len(theirs)
    diffs = sum(1 for a, b in zip(ours, theirs) if a != b)
    # local-compiler float rounding yields scattered 1-ulp differences
    assert diffs <= max_frac * len(ours), f"{diffs} byte diffs of {len(ours)}"


@pytest.mark.parametrize("args,kw", [
    ((), dict(max_depth=7)),
    (("-d", "3", "-s", "5"), dict(max_depth=3, special_position=5)),
])
def test_build_fixed(oracle_bin, args, kw):
    rng = np.random.default_rng(5)
    strings = ["".join(rng.choice(list("acgt"), 12)) for _ in range(200)]
    fasta = "".join(f">s{i}\n{s}\n" for i, s in enumerate(strings))
    res = subprocess.run(
        [str(oracle.BIN / "build-fixed"), *args], input=fasta.encode(),
        capture_output=True,
    )
    fm = fixed_icm.train_fixed_icm([dna.encode(s) for s in strings], **kw)
    import tempfile

    with tempfile.NamedTemporaryFile() as tf:
        fixed_icm.write_fixed_icm(fm, tf.name)
        ours = open(tf.name, "rb").read()
    _ulp_compare(ours, res.stdout)
    # structural identity: round-trip the oracle's file and compare trees
    with tempfile.NamedTemporaryFile() as tf:
        tf.write(res.stdout)
        tf.flush()
        theirs = fixed_icm.read_fixed_icm(tf.name)
    assert theirs.length == fm.length
    for a, b in zip(fm.sub_models, theirs.sub_models):
        np.testing.assert_array_equal(a.mip, b.mip)


def test_score_fixed_null_mode(oracle_bin, tmp_path):
    rng = np.random.default_rng(6)
    strings = ["".join(rng.choice(list("acgt"), 10)) for _ in range(150)]
    fasta = "".join(f">s{i}\n{s}\n" for i, s in enumerate(strings))
    model_path = tmp_path / "m.icm"
    res = subprocess.run(
        [str(oracle.BIN / "build-fixed")], input=fasta.encode(), capture_output=True
    )
    model_path.write_bytes(res.stdout)
    fm = fixed_icm.read_fixed_icm(model_path)

    test = ["".join(rng.choice(list("acgt"), 10)) for _ in range(25)]
    tf_text = "".join(f">t{i}\n{s}\n" for i, s in enumerate(test))
    res = subprocess.run(
        [str(oracle.BIN / "score-fixed"), "-N", str(model_path)],
        input=tf_text.encode(), capture_output=True,
    )
    want = res.stdout.decode()
    lines = []
    for i, s in enumerate(test):
        ps = fm.score_window(dna.encode(s))
        ln = len(s)
        lines.append(
            "%5d:  %10.4f %9.5f   %10.4f %9.5f   %9.5f"
            % (i + 1, ps, ps / ln, 0.0, 0.0, ps / ln - 0.0)
        )
    assert "\n".join(lines) + "\n" == want


def test_score_fixed_icm_neg_mode(oracle_bin, tmp_path):
    """-I mode: negative model is a streaming ICM scored at frame 1."""
    rng = np.random.default_rng(7)
    strings = ["".join(rng.choice(list("acgt"), 10)) for _ in range(150)]
    fasta = "".join(f">s{i}\n{s}\n" for i, s in enumerate(strings))
    pos_path = tmp_path / "pos.icm"
    res = subprocess.run(
        [str(oracle.BIN / "build-fixed")], input=fasta.encode(), capture_output=True
    )
    pos_path.write_bytes(res.stdout)

    from glimmer_mg_tpu.models import icm as icm_mod, icm_train

    neg_strings = ["".join(rng.choice(list("acgt"), 300)) for _ in range(30)]
    neg = icm_train.train_icm([dna.encode(s) for s in neg_strings])
    neg_path = tmp_path / "neg.icm"
    icm_mod.write_icm(neg, neg_path)

    test = ["".join(rng.choice(list("acgt"), 10)) for _ in range(20)]
    tf_text = "".join(f">t{i}\n{s}\n" for i, s in enumerate(test))
    res = subprocess.run(
        [str(oracle.BIN / "score-fixed"), "-I", str(pos_path), str(neg_path)],
        input=tf_text.encode(), capture_output=True,
    )
    want = res.stdout.decode()
    fm = fixed_icm.read_fixed_icm(pos_path)
    lines = []
    for i, s in enumerate(test):
        idx = dna.encode(s)
        ps = fm.score_window(idx)
        ns = icm_mod.score_string(neg, idx, 1)
        ln = len(s)
        lines.append(
            "%5d:  %10.4f %9.5f   %10.4f %9.5f   %9.5f"
            % (i + 1, ps, ps / ln, ns, ns / ln, ps / ln - ns / ln)
        )
    assert "\n".join(lines) + "\n" == want
