from .local_agg import local_sigmoid_aggregate

__all__ = ["local_sigmoid_aggregate"]
