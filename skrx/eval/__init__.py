from .evaluator import MetricReport, RankingEvaluator, EarlyStopping

__all__ = ["MetricReport", "RankingEvaluator", "EarlyStopping"]
