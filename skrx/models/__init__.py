from .base import AbstractRecommender, JaxRecommender

__all__ = ["AbstractRecommender", "JaxRecommender"]
