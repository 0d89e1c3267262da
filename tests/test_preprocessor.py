import math

import numpy as np
import pandas as pd
import pytest

from skrx.io import Preprocessor, RSDataset
from skrx.io.synthetic import make_interactions


def _proc(df):
    p = Preprocessor()
    p.load_dataframe(df, columns="UIRT", name="t")
    return p


def test_filter_fixpoint():
    df = make_interactions(50, 80, 600, seed=1)
    p = _proc(df)
    p.filter_data(user_min=5, item_min=3)
    users = p.all_data["user"].value_counts()
    items = p.all_data["item"].value_counts()
    assert users.min() >= 5
    assert items.min() >= 3


def test_remap_contiguous():
    df = make_interactions(40, 60, 500, seed=2)
    df["user"] = df["user"] * 10 + 3  # non-contiguous raw ids
    p = _proc(df)
    p.remap_data_id()
    assert set(p.all_data["user"].unique()) == set(range(p.all_data["user"].nunique()))
    assert set(p.all_data["item"].unique()) == set(range(p.all_data["item"].nunique()))


def test_split_by_ratio_per_user():
    df = make_interactions(30, 50, 600, seed=3)
    p = _proc(df)
    p.remap_data_id()
    p.split_data_by_ratio(0.7, 0.1, 0.2, by_time=True)
    for user, group in p.all_data.groupby("user"):
        n = len(group)
        n_train = len(p.train_data[p.train_data["user"] == user])
        assert n_train == math.ceil(0.7 * n)
        # chronological: max train time <= min test time
        tr = p.train_data[p.train_data["user"] == user]["time"]
        te = p.test_data[p.test_data["user"] == user]["time"]
        if len(te):
            assert tr.max() <= te.min()
    total = len(p.train_data) + len(p.valid_data) + len(p.test_data)
    assert total == len(p.all_data)


def test_split_leave_out():
    df = make_interactions(30, 50, 600, seed=4)
    p = _proc(df)
    p.remap_data_id()
    p.split_data_by_leave_out(valid=1, test=1, by_time=True)
    counts = p.test_data["user"].value_counts()
    assert (counts <= 1).all()
    counts_v = p.valid_data["user"].value_counts()
    assert (counts_v <= 1).all()


def test_save_and_reload(tmp_path):
    df = make_interactions(30, 50, 600, seed=5)
    p = _proc(df)
    p.drop_duplicates()
    p.filter_data(user_min=3, item_min=1)
    p.remap_data_id()
    p.split_data_by_ratio(0.7, 0.1, 0.2)
    out_dir = p.save_data(str(tmp_path))
    ds = RSDataset(out_dir, "\t", "UIRT")
    assert ds.num_ratings == len(p.all_data)
    assert ds.cf_data.user2id is not None


def test_bad_ratio():
    df = make_interactions(10, 20, 100, seed=6)
    p = _proc(df)
    with pytest.raises(ValueError):
        p.split_data_by_ratio(0.5, 0.1, 0.2)
