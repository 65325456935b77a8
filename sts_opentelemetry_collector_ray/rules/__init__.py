from .expr import CompiledExpr, ExprError, compile_expr
from .model import (
    ComponentRule,
    RegexTagMapping,
    RelationRule,
    Rule,
    TagMapping,
    default_ruleset,
    load_ruleset,
)

__all__ = [
    "CompiledExpr",
    "ExprError",
    "compile_expr",
    "ComponentRule",
    "RelationRule",
    "Rule",
    "TagMapping",
    "RegexTagMapping",
    "default_ruleset",
    "load_ruleset",
]
