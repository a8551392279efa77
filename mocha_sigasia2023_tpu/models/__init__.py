"""Neural networks: graphs, ST-GCN + transformer generator, CVAE, projector."""

from . import convert, cvae, generator, graph, layers, projector
from .generator import GeneratorConfig
from .cvae import CVAEConfig
from .projector import ProjectorConfig
