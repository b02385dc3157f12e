"""Core infrastructure: H5 parsing, graph compilation, pytree utilities."""
from .h5io import LayerDef, ModelDef, read_model
from .graph import GraphModel, TrainableGraphHead, compile_model, load_graph_model

__all__ = [
    "LayerDef", "ModelDef", "read_model",
    "GraphModel", "TrainableGraphHead", "compile_model", "load_graph_model",
]
