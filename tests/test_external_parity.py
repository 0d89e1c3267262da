"""Dry-run plumbing tests for the external parity runbook
(scripts/external_parity.py, VERDICT r4 #7): fetch/extract with a MOCKED
network, preprocessing into the shared split contract, the pinned CLI
command construction for both sides, and best-epoch log parsing — so the
runbook stays executable for the environment that has network + Cython."""
import importlib.util
import io
import gzip
import os
import sys
import zipfile

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "external_parity",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "external_parity.py"))
ep = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ep)


def _fake_ratings(n=400, users=30, items=40, seed=0, sep="\t"):
    rng = np.random.default_rng(seed)
    rows = [f"{rng.integers(users)}{sep}{rng.integers(items)}{sep}"
            f"{rng.integers(1, 6)}{sep}{880000000 + i}" for i in range(n)]
    return "\n".join(rows) + "\n"


def test_fetch_zip_extracts_member(tmp_path):
    payload = _fake_ratings().encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("ml-100k/u.data", payload)

    def opener(url):
        assert url == ep.DATASETS["ml-100k"]["url"]
        return buf.getvalue()

    raw = ep.fetch_raw("ml-100k", str(tmp_path), opener=opener)
    assert open(raw, "rb").read() == payload
    # second call hits the on-disk copy (no opener needed)
    assert ep.fetch_raw("ml-100k", str(tmp_path)) == raw


def test_fetch_gowalla_gz_remaps_columns(tmp_path):
    lines = ["7\t2010-10-19T23:55:27Z\t30.23\t-97.79\t22847",
             "7\t2010-10-18T22:17:43Z\t30.26\t-97.74\t420315"]
    blob = gzip.compress(("\n".join(lines) + "\n").encode())
    raw = ep.fetch_raw("gowalla", str(tmp_path), opener=lambda u: blob)
    out = open(raw).read().splitlines()
    # (user, time, lat, lon, loc) -> user \t item \t time
    assert out[0] == "7\t22847\t2010-10-19T23:55:27Z"
    assert len(out[0].split("\t")) == 3


def test_fetch_yelp_is_license_gated(tmp_path):
    with pytest.raises(RuntimeError, match="license-gated"):
        ep.fetch_raw("yelp", str(tmp_path))


def test_preprocess_produces_loadable_split(tmp_path):
    raw = tmp_path / "ml-100k.raw"
    raw.write_text(_fake_ratings(n=800, users=25, items=30))
    split = ep.preprocess("ml-100k", str(raw), str(tmp_path / "out"))
    names = os.listdir(split)
    for suffix in (".train", ".valid", ".test", ".user2id", ".item2id"):
        assert any(n.endswith(suffix) for n in names), (suffix, names)
    from skrx.io import RSDataset
    ds = RSDataset(split, "\t", "UIRT")
    assert ds.num_users > 0 and ds.num_items > 0
    assert len(ds.train_data.to_user_item_pairs()) > 0


def test_side_command_pins_shared_contract():
    cmd = ep.side_command("/repo/run_skrx.py", "LightGCN",
                          "/data/gowalla_split", ep.CONFIGS["lightgcn"]
                          ["flags"], "UIT", "\\t")
    s = " ".join(cmd)
    assert "--recommender LightGCN" in s
    assert "--seed 2021" in s and "--top_k (20,)" in s
    assert "--metric ('Recall','NDCG')" in s
    assert "--n_layers 3" in s and "--embed_size 64" in s


def test_parse_best_prefers_best_row_and_falls_back():
    log = ("metrics:\tRecall@20\tNDCG@20\n"
           "epoch 0:\t0.1000\t0.0800\tloss=1\n"
           "epoch 1:\t0.1500\t0.1200\tloss=0.9\n"
           "best:   \t0.1500\t0.1200\n")
    assert ep.parse_best(log) == (0.15, 0.12)
    no_best = "\n".join(line for line in log.splitlines()
                        if "best" not in line)
    assert ep.parse_best(no_best) == (0.15, 0.12)


def test_all_configs_reference_known_datasets():
    for key, cfg in ep.CONFIGS.items():
        assert cfg["dataset"] in ep.DATASETS, key
