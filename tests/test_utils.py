import configparser

import numpy as np
import pytest

from skrx.utils import (Config, ModelConfig, OrderedDefaultDict, pad_sequences,
                        slugify, merge_config_with_cmd_args,
                        merge_config_with_ini, normalize_adj_matrix,
                        randint_choice, batch_randint_choice)
import scipy.sparse as sp


def test_ordered_default_dict():
    d = OrderedDefaultDict(int)
    d["b"] += 1
    d["a"] += 2
    d["b"] += 3
    assert list(d.keys()) == ["b", "a"]
    assert d["b"] == 4


@pytest.mark.parametrize("padding", ["pre", "post"])
@pytest.mark.parametrize("truncating", ["pre", "post"])
def test_pad_sequences(padding, truncating):
    seqs = [[1, 2, 3], [4], [5, 6, 7, 8, 9]]
    out = pad_sequences(seqs, value=0, max_len=4, padding=padding,
                        truncating=truncating)
    assert out.shape == (3, 4)
    assert out.dtype == np.int32
    if truncating == "pre":
        assert 5 not in out[2]
    else:
        assert 9 not in out[2]
    if padding == "pre":
        assert out[1, -1] == 4
    else:
        assert out[1, 0] == 4


def test_slugify():
    assert "/" not in slugify("a/b:c?d")
    assert slugify("a b\tc") == "a_b_c"


def test_config_validation_and_merge():
    class MyConfig(ModelConfig):
        lr = 0.01
        reg = 0.001
        n_dim = 64

        def _validate(self):
            assert self.lr > 0

        @classmethod
        def param_space(cls):
            return {"lr": [0.1, 0.01], "reg": [0.0, 0.001, 0.01]}

    cfg = MyConfig(lr=0.5, unknown_key=3)
    assert cfg.lr == 0.5
    assert not hasattr(cfg, "unknown_key")
    assert MyConfig.num_combos() == 6
    with pytest.raises(AssertionError):
        MyConfig(lr=-1.0)

    merged = merge_config_with_cmd_args({"lr": 0.01},
                                        argv=["--lr", "0.3", "--name", "abc",
                                              "--ks", "(1,2,3)"])
    assert merged["lr"] == 0.3
    assert merged["name"] == "abc"
    assert merged["ks"] == (1, 2, 3)
    with pytest.raises(SyntaxError):
        merge_config_with_cmd_args({}, argv=["--lr"])


def test_ini_merge(tmp_path):
    ini = tmp_path / "conf.ini"
    parser = configparser.ConfigParser()
    parser["model"] = {"lr": "0.05", "layers": "[64, 32]"}
    with open(ini, "w") as f:
        parser.write(f)
    merged = merge_config_with_ini({"lr": 0.1}, str(ini))
    assert merged["lr"] == 0.05
    assert merged["layers"] == [64, 32]


def test_normalize_adj_matrix():
    mat = sp.csr_matrix(np.array([[0, 1, 1], [1, 0, 0], [0, 0, 0]], dtype=float))
    left = normalize_adj_matrix(mat, "left").toarray()
    np.testing.assert_allclose(left[0], [0, 0.5, 0.5])
    np.testing.assert_allclose(left[2], [0, 0, 0])
    sym = normalize_adj_matrix(mat, "symmetric").toarray()
    d_inv_sqrt = np.array([1 / np.sqrt(2.0), 1.0, 0.0])  # row degrees [2,1,0]
    expected = np.outer(d_inv_sqrt, d_inv_sqrt) * mat.toarray()
    np.testing.assert_allclose(sym, expected)
    with pytest.raises(ValueError):
        normalize_adj_matrix(mat, "bogus")


def test_randint_choice_exclusion():
    excl = [0, 1, 2, 3, 4]
    out = randint_choice(10, size=1000, exclusion=excl)
    assert out.dtype == np.int32
    assert not np.isin(out, excl).any()
    assert out.min() >= 5 and out.max() <= 9

    out_nr = randint_choice(10, size=5, replace=False, exclusion=excl)
    assert sorted(out_nr.tolist()) == [5, 6, 7, 8, 9]

    p = np.zeros(10)
    p[7] = 1.0
    out_w = randint_choice(10, size=20, p=p)
    assert (np.asarray(out_w) == 7).all()


def test_batch_randint_choice():
    res = batch_randint_choice(100, [3, 5], exclusion=[[1], [2, 3]])
    assert len(res) == 2
    assert len(np.atleast_1d(res[0])) == 3
    assert not np.isin(np.atleast_1d(res[1]), [2, 3]).any()


def test_typeassert_and_timer(capsys):
    from skrx.utils import typeassert, timer

    @typeassert(x=int, y=(int, float))
    def f(x, y=1.0):
        return x + y

    assert f(1, 2.0) == 3.0
    with pytest.raises(TypeError):
        f("a", 2.0)

    @timer
    def g():
        return 42

    assert g() == 42
    assert "took" in capsys.readouterr().out


def test_md5sum(tmp_path):
    from skrx.utils import md5sum
    p = tmp_path / "x.bin"
    p.write_bytes(b"hello world")
    assert md5sum(str(p)) == "5eb63bbbe01eeed093cb22bb8f5acdc3"


def test_preprocessor_load_data_file(tmp_path):
    from skrx.io import Preprocessor
    raw = tmp_path / "log.rating"
    raw.write_text("u1\t5\t4\t100\nu1\t6\t3\t101\nu2\t5\t5\t102\n")
    p = Preprocessor()
    p.load_data(str(raw), sep="\t", columns="UIRT")
    assert len(p.all_data) == 3
    p.remap_data_id()
    assert set(p.all_data["user"]) == {0, 1}
    with pytest.raises(FileNotFoundError):
        p.load_data(str(tmp_path / "missing"), sep="\t", columns="UIRT")
    with pytest.raises(ValueError):
        p.load_data(str(raw), sep="\t", columns="BAD")


def test_resolve_eval_batch_size_auto():
    from skrx.models.base import resolve_eval_batch_size
    assert resolve_eval_batch_size(64, 10**6) == 64        # explicit int wins
    assert resolve_eval_batch_size("auto", 40_000) == 4096
    assert resolve_eval_batch_size("auto", 1_000_000) == 256
    assert resolve_eval_batch_size("auto", 100) == 4096    # clamped high
    # config accepts the sentinel
    from skrx import RunConfig
    rc = RunConfig(recommender="BPRMF", data_dir=".", test_batch_size="auto")
    assert rc.test_batch_size == "auto"
