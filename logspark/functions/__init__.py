"""Column-expression compilers: %{field} templates and routing predicates."""

from logspark.functions.predicates import compile_predicate
from logspark.functions.templates import compile_template

__all__ = ["compile_template", "compile_predicate"]
