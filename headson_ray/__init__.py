"""headson_ray — a Ray-Data-native streaming engine whose per-document
transform reimplements the reference budget-driven tree summarizer, with a
from-scratch CEP layer (windows, watermarks, stateful joins, exactly-once
sinks) on top.
"""

from .core.api import (
    headson,
    headson_many,
    headson_many_text,
    headson_many_yaml,
    headson_text,
    headson_yaml,
    register_format,
    registered_formats,
    summarize,
    unregister_format,
)
from .core.config import PriorityConfig, RenderConfig

__all__ = [
    "headson",
    "headson_many",
    "headson_many_text",
    "headson_many_yaml",
    "headson_text",
    "headson_yaml",
    "register_format",
    "registered_formats",
    "summarize",
    "unregister_format",
    "PriorityConfig",
    "RenderConfig",
]

__version__ = "0.1.0"
