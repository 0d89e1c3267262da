import numpy as np
import scipy.sparse as sp

from skrx.io import RSDataset, group_users_by_interactions


def test_views_types(synth_dataset):
    train = synth_dataset.train_data
    pairs = train.to_user_item_pairs()
    assert pairs.dtype == np.int32 and pairs.ndim == 2 and pairs.shape[1] == 2
    assert isinstance(train.to_set_of_users(), set)
    assert isinstance(train.to_csr_matrix(), sp.csr_matrix)
    assert isinstance(train.to_csc_matrix(), sp.csc_matrix)
    assert isinstance(train.to_dok_matrix(), sp.dok_matrix)
    assert isinstance(train.to_coo_matrix(), sp.coo_matrix)
    ud = train.to_user_dict()
    assert all(isinstance(v, np.ndarray) for v in ud.values())
    udt = train.to_user_dict_by_time()
    assert set(ud.keys()) == set(udt.keys())
    for u in ud:
        assert sorted(ud[u].tolist()) == sorted(udt[u].tolist())
    idict = train.to_item_dict()
    assert sum(len(v) for v in idict.values()) == len(train)
    seqs = train.to_truncated_seq_dict(max_len=5)
    assert all(len(v) == 5 for v in seqs.values())


def test_num_users_items_consistency(synth_dataset):
    cf = synth_dataset.cf_data
    max_id = 0
    for split in (cf.train_data, cf.valid_data, cf.test_data):
        if not split.is_empty():
            max_id = max(max_id, int(split.to_user_item_pairs()[:, 0].max()))
    assert cf.num_users == max_id + 1
    assert cf.num_ratings == (len(cf.train_data) + len(cf.valid_data)
                              + len(cf.test_data))
    assert "statistic" in cf.statistic_info.lower()


def test_padded_positive_table(synth_dataset):
    train = synth_dataset.train_data
    pp = train.to_padded_positive_table()
    assert pp.table.shape[0] == train.num_users
    assert pp.table.dtype == np.int32
    assert pp.pad_id == train.num_items
    ud = train.to_user_dict()
    for u, items in ud.items():
        row = pp.table[u]
        assert pp.lengths[u] == len(items)
        np.testing.assert_array_equal(row[: len(items)], np.sort(items))
        assert (row[len(items):] == train.num_items).all()
    # rows sorted ascending => searchsorted membership works
    assert (np.diff(pp.table, axis=1) >= 0).all()


def test_padded_seq_tensor(synth_dataset):
    train = synth_dataset.train_data
    table, lengths = train.to_padded_seq_tensor(max_len=8)
    assert table.shape == (train.num_users, 8)
    seq_dict = train.to_user_dict_by_time()
    for u, seq in seq_dict.items():
        tail = seq[-8:]
        np.testing.assert_array_equal(table[u, 8 - len(tail):], tail)
        assert (table[u, : 8 - len(tail)] == train.num_items).all()
        assert lengths[u] == min(len(seq), 8)


def test_group_users_by_interactions(synth_dataset):
    groups = group_users_by_interactions(synth_dataset, num_groups=4)
    assert len(groups) <= 4
    all_users = np.concatenate([g.users for g in groups])
    assert len(all_users) == len(set(all_users.tolist()))
    assert len(all_users) == len(synth_dataset.train_data.to_user_dict())
    total = sum(g.num_interactions for g in groups)
    assert total == len(synth_dataset.train_data)


def test_cache_roundtrip(tmp_path):
    from skrx.io import synthetic, CFData
    path = synthetic.make_dataset_dir(str(tmp_path), num_users=30,
                                      num_items=40, num_ratings=400, seed=3)
    cf1 = CFData(path, "\t", "UIRT")
    pairs1 = cf1.train_data.to_user_item_pairs()
    cf1._cache.save_from({"train": cf1.train_data, "valid": cf1.valid_data,
                          "test": cf1.test_data})
    cf2 = CFData(path, "\t", "UIRT")
    # cache restored: view present without recompute
    assert any(k[0] == "to_user_item_pairs"
               for k in cf2.train_data._view_cache.keys())
    np.testing.assert_array_equal(pairs1, cf2.train_data.to_user_item_pairs())
