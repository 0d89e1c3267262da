"""Knowledge-graph data layer, KG iterator, and registry edge cases."""
import os

import numpy as np
import pytest

from skrx.io import KGPairwiseIterator, RSDataset
from skrx.io.synthetic import make_dataset_dir
from skrx.utils import ModelRegistry


@pytest.fixture(scope="module")
def kg_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("kg")
    path = make_dataset_dir(str(root), num_users=30, num_items=50,
                            num_ratings=600, seed=8)
    # write a .kg triplet file (head, relation, tail)
    rng = np.random.default_rng(0)
    name = os.path.basename(path)
    with open(os.path.join(path, name + ".kg"), "w") as f:
        for _ in range(300):
            f.write(f"{rng.integers(0, 60)}\t{rng.integers(0, 5)}\t"
                    f"{rng.integers(0, 60)}\n")
    return RSDataset(path, "\t", "UIRT")


def test_kg_views(kg_dataset):
    kg = kg_dataset.kg_data
    assert kg.num_entities <= 60 and kg.num_entities > 0
    assert kg.num_relations <= 5
    trip = kg.to_triplets()
    assert trip.shape[1] == 3 and trip.dtype == np.int32
    head_dict = kg.to_head_dict()
    assert sum(len(v["tail"]) for v in head_dict.values()) == kg.num_triplets
    csr_dict = kg.to_csr_matrix_dict()
    assert set(csr_dict.keys()).issubset(set(range(kg.num_relations)))
    assert kg_dataset.num_triplets == kg.num_triplets


def test_kg_pairwise_iterator(kg_dataset):
    it = KGPairwiseIterator(kg_dataset.kg_data, num_neg=2, batch_size=32,
                            shuffle=False)
    heads, rels, pos, neg = next(iter(it))
    assert heads.shape == (32,) and rels.shape == (32,) and pos.shape == (32,)
    assert neg.shape == (32, 2)
    head_dict = kg_dataset.kg_data.to_head_dict()
    for h, n in zip(heads, neg):
        assert not np.isin(n, head_dict[int(h)]["tail"]).any()


def test_registry_from_dir(tmp_path):
    model_dir = tmp_path / "unarchived_models"
    model_dir.mkdir()
    (model_dir / "MyModel.py").write_text(
        "class MyModelConfig:\n    pass\n\n"
        "class MyModel:\n    pass\n")
    reg = ModelRegistry()
    assert reg.load_model_from_dir(str(model_dir), "MyModel")
    cls, cfg = reg.get_model("MyModel")
    assert cls.__name__ == "MyModel"
    assert not reg.load_model_from_dir(str(model_dir), "Nope")
    with pytest.raises(KeyError):
        reg.get_model("Nope")


def test_registry_unknown_model():
    reg = ModelRegistry()
    assert not reg.load_skrx_model("DoesNotExist")
    assert "BPRMF" not in reg.list_models()
