"""Shared utilities: graph plotting, logging."""
from .log import LogLevel, log
from .plot import chain_graph_dot, plot_chain_graph, plot_compute_graph

__all__ = ["LogLevel", "log", "chain_graph_dot", "plot_chain_graph",
           "plot_compute_graph"]
