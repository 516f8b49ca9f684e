from .parser import parse_program
from .chain import ChainGraph
from .analysis import ChainAnalysis

__all__ = ["parse_program", "ChainGraph", "ChainAnalysis"]
