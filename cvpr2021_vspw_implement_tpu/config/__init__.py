from .defaults import cfg
from .node import CfgNode
from . import args

__all__ = ["cfg", "CfgNode", "args"]
