"""Baseline-bridge file format round trips."""

import os

import numpy as np

from conftest import make_synthetic
from hgaprec_tpu.data import formats
from hgaprec_tpu.data.ratings import RatingsStore


def _store(rng):
    store, validation, test = make_synthetic(rng, n=20, m=15, density=0.4)
    return store, validation


def test_lda_training_matrix(tmp_path, rng):
    store, _ = _store(rng)
    n = formats.write_lda_training_matrix(store, str(tmp_path / "l.tsv"))
    lines = open(tmp_path / "l.tsv").read().splitlines()
    assert len(lines) == n
    first = lines[0].split()
    deg = int(first[0])
    assert len(first) == deg + 1
    item, y = first[1].split(":")
    assert store.r(0, int(item)) == int(y)


def test_chi_matrixmarket_roundtrip(tmp_path, rng):
    store, validation = _store(rng)
    formats.write_chi_training_matrix(store, validation, str(tmp_path))
    head = open(tmp_path / "chitrain.tsv").read().splitlines()
    assert head[0] == "%%MatrixMarket matrix coordinate real general"
    nu, ni, nr = (int(x) for x in head[1].split())
    assert nr == store.nratings
    # 1-based coordinates
    u1, m1, y1 = (int(x) for x in head[2].split())
    assert store.r(u1 - 1, m1 - 1) == y1


def test_mm_load_rowmajor(tmp_path):
    path = tmp_path / "f.mm"
    path.write_text("%%MatrixMarket matrix array real general\n%\n2 3\n"
                    "1.5 2.5 3.5\n4.5 5.5 6.5\n")
    out = formats.mm_load_rowmajor(str(path), 2, 3)
    np.testing.assert_allclose(out, [[1.5, 2.5, 3.5], [4.5, 5.5, 6.5]])


def test_lda_factor_import(tmp_path):
    n, m, k = 3, 4, 2
    (tmp_path / "gamma.tsv").write_text("1 3\n2 2\n4 4\n")
    # beta: [k, m] log probs
    (tmp_path / "beta.tsv").write_text("0 -1 -2 -3\n-3 -2 -1 0\n")
    theta, beta = formats.load_lda_factors(
        n, m, k, str(tmp_path / "gamma.tsv"), str(tmp_path / "beta.tsv"))
    np.testing.assert_allclose(theta.sum(1), 1.0)
    assert beta.shape == (m, k)
    np.testing.assert_allclose(beta[0], [np.exp(0), np.exp(-3)])


def test_ctr_import(tmp_path):
    (tmp_path / "final-U.dat").write_text("1 2\n3 4\n")
    (tmp_path / "final-V.dat").write_text("5 6\n7 8\n9 10\n")
    (tmp_path / "user_map.dat").write_text("100,0\n101,1\n")
    (tmp_path / "item_map.dat").write_text("200,0\n201,1\n202,2\n")
    theta, beta, umap, imap = formats.load_ctr_factors(
        2, 3, 2, str(tmp_path))
    assert theta.shape == (2, 2) and beta.shape == (3, 2)
    assert umap[101] == 1 and imap[202] == 2


def test_nmf_training_matrix(tmp_path, rng):
    store, _ = _store(rng)
    nrows = formats.write_nmf_training_matrix(store,
                                              str(tmp_path / "t.tsv"))
    lines = open(tmp_path / "t.tsv").read().splitlines()
    assert int(lines[0]) == nrows
    assert int(lines[1]) == store.m
    row0 = [int(v) for v in lines[2].split()]
    assert len(row0) == store.m
