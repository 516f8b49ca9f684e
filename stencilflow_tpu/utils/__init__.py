"""Shared utilities: graph plotting, logging."""
from .log import LogLevel, log
from .plot import plot_chain_graph, plot_compute_graph

__all__ = ["LogLevel", "log", "plot_chain_graph", "plot_compute_graph"]
