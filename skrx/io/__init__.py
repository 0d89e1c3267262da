from .batch_iterator import BatchIterator
from .dataset import (ImplicitFeedback, KnowledgeGraph, CFData, KGData, MMData,
                      RSDataset, UserGroup, group_users_by_interactions,
                      PaddedPositives)
from .data_iterator import (InteractionIterator, PointwiseIterator,
                            PairwiseIterator, SequentialPointwiseIterator,
                            SequentialPairwiseIterator, UserVecIterator,
                            ItemVecIterator, KGPairwiseIterator)
from .preprocessor import Preprocessor
from .movielens import MovieLens100k
from . import synthetic
# Logger lives in utils but is re-exported here for reference-API parity
# (skrec.io.Logger, skrec/io/__init__.py)
from ..utils.logger import Logger

__all__ = [
    "BatchIterator",
    "ImplicitFeedback", "KnowledgeGraph", "CFData", "KGData", "MMData",
    "RSDataset", "UserGroup", "group_users_by_interactions", "PaddedPositives",
    "InteractionIterator", "PointwiseIterator", "PairwiseIterator",
    "SequentialPointwiseIterator", "SequentialPairwiseIterator",
    "UserVecIterator", "ItemVecIterator", "KGPairwiseIterator",
    "Preprocessor", "MovieLens100k", "synthetic", "Logger",
]
