from .base import AbstractRecommender, JaxRecommender

MODEL_NAMES = [
    "Pop", "BPRMF", "AOBPR", "FPMC", "TransRec", "CML", "CDAE", "MultVAE",
    "GRU4Rec", "GRU4RecPlus", "SASRec", "BERT4Rec", "Caser", "HGN", "SRGNN",
    "SGAT", "LightGCN", "LayerGCN", "DENS", "LightGCL", "SelfCF", "LATTICE",
    "SLMRec", "BM3", "FREEDOM", "MGCN",
]

__all__ = ["AbstractRecommender", "JaxRecommender", "MODEL_NAMES"]


def __getattr__(name):
    """Lazy convenience access: ``skrx.models.BPRMF`` loads the module;
    model classes live at ``skrx.models.<Name>.<Name>`` (registry contract)."""
    if name in MODEL_NAMES:
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
