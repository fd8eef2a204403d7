"""Trainer parity: our vectorized trainer vs reference build-icm."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from glimmer_mg_tpu.models import dna, icm as icm_mod, icm_train

from . import oracle

TRAIN_FILE = Path("/root/reference/sample-run/glimmer3/results/NC_000915.train")


@pytest.fixture(scope="module")
def oracle_bin():
    if not oracle.available():
        pytest.skip("reference sources unavailable")
    return oracle.ensure_built()


def _oracle_build_icm(fasta_text: str, out_path, *args):
    bin_dir = oracle.ensure_built()
    res = subprocess.run(
        [str(bin_dir / "build-icm"), *args, str(out_path)],
        input=fasta_text,
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr


def _compare(ours: icm_mod.ICM, theirs: icm_mod.ICM, ulps: int = 1):
    np.testing.assert_array_equal(ours.mip, theirs.mip, err_msg="tree structure")
    alive = ours.mip >= -1
    a = ours.probs[alive].view(np.int32)
    b = theirs.probs[alive].view(np.int32)
    diff = np.abs(a.astype(np.int64) - b.astype(np.int64))
    assert diff.max() <= ulps, f"max ulp diff {diff.max()} (count>{ulps}: {(diff > ulps).sum()})"


def _random_fasta(rng, n, lo, hi, gc=0.5):
    seqs = []
    p = [(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2]
    for _ in range(n):
        m = int(rng.integers(lo, hi))
        seqs.append("".join(rng.choice(list("acgt"), m, p=p)))
    fasta = "".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs))
    return seqs, fasta


@pytest.mark.parametrize(
    "kwargs,args",
    [
        (dict(model_len=12, depth=7, periodicity=3), []),
        (dict(model_len=12, depth=7, periodicity=3), ["-r"]),
        (dict(model_len=9, depth=4, periodicity=3), ["-w", "9", "-d", "4"]),
        (dict(model_len=8, depth=3, periodicity=1), ["-w", "8", "-d", "3", "-p", "1"]),
        (dict(model_len=6, depth=5, periodicity=2), ["-w", "6", "-d", "5", "-p", "2"]),
    ],
)
def test_trainer_random_data(tmp_path, oracle_bin, kwargs, args):
    rng = np.random.default_rng(hash(tuple(args)) % 2**32)
    seqs, fasta = _random_fasta(rng, 40, 20, 800, gc=0.42)
    out = tmp_path / "ref.icm"
    _oracle_build_icm(fasta, out, *args)
    theirs = icm_mod.read_icm(out)

    strings = icm_train.prepare_training_strings(seqs, reverse="-r" in args)
    ours = icm_train.train_icm([dna.encode(s) for s in strings], **kwargs)
    _compare(ours, theirs)


def test_trainer_skip_stops(tmp_path, oracle_bin):
    rng = np.random.default_rng(123)
    seqs, fasta = _random_fasta(rng, 30, 30, 300)
    out = tmp_path / "ref.icm"
    _oracle_build_icm(fasta, out, "-F", "-r")
    theirs = icm_mod.read_icm(out)
    strings = icm_train.prepare_training_strings(
        seqs, reverse=True, skip_in_frame_stops=True
    )
    ours = icm_train.train_icm([dna.encode(s) for s in strings])
    _compare(ours, theirs)


def test_trainer_sample_run(tmp_path, oracle_bin):
    """Full-genome training set: must reproduce NC_000915.icm (<=1 ulp)."""
    if not TRAIN_FILE.exists():
        pytest.skip("sample-run train file unavailable")
    from glimmer_mg_tpu.io.fasta import read_fasta

    recs = list(read_fasta(TRAIN_FILE))
    strings = icm_train.prepare_training_strings([s for _, s in recs], reverse=True)
    ours = icm_train.train_icm([dna.encode(s) for s in strings])
    theirs = icm_mod.read_icm("/root/reference/sample-run/glimmer3/results/NC_000915.icm")
    _compare(ours, theirs, ulps=2)
