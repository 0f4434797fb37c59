"""Planning layer: contract → Catalyst expressions."""
from .rule_compiler import *  # noqa: F401,F403
