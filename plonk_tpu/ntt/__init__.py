from .domain import EvaluationDomain, ntt_host

__all__ = ["EvaluationDomain", "ntt_host"]
