"""Rule engine: RainerScript-semantics routing compiled to Column plans.

- :mod:`selectors`  classic PRI selectors ("mail.info;*.=err") → bitmask
- :mod:`rscript`    RainerScript expression/statement parser (subset)
- :mod:`compiler`   AST → Column with reference coercion semantics
- :mod:`router`     statement list → per-sink predicates, single-pass
                    multi-sink write
"""

from rsyslog_spark.rules.selectors import prifilt, selector_mask  # noqa: F401
from rsyslog_spark.rules.rscript import parse_expr, parse_script  # noqa: F401
from rsyslog_spark.rules.compiler import compile_expr  # noqa: F401
from rsyslog_spark.rules.router import Router, compile_routes  # noqa: F401
