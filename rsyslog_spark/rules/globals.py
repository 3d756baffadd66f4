"""``$/`` global variables compiled to window aggregates.

rsyslog's global variables (``$/name``) are a single cross-message
store; the reference's own documentation warns that read-modify-write
on them is order-dependent once multiple queue workers run
(doc: rainerscript/global_variables; runtime msg.c variable store).
The Spark-first mapping keeps EXACT sequential semantics under an
explicit total order and scales exactly the way rsyslog does — by
sharding the store per worker:

- default: one logical store — ``Window.partitionBy(lit(0))
  .orderBy(order_col)``. Bit-exact rsyslog-with-one-worker semantics;
  a single-partition window, so this is the fidelity mode, not the
  100 TB mode.
- scale: pass ``worker_col`` (e.g. ``"source"``) — each worker key
  folds its own store in order, which is precisely the reference's
  concurrency story (each queue worker interleaves its own updates;
  cross-worker ordering was never defined).

Supported write forms (anything else raises, pointing here):

- ``set $/x = $/x + E`` (or ``E + $/x``), E free of ``$/`` → running
  SUM of ``when(path-cond ∧ live, var2Number(E))``. Counters
  (``set $/n = $/n + 1``) are the degenerate case.
- ``set $/x = E``, E free of ``$/`` → LAST-SET value:
  ``last(when(eff, E), ignorenulls)``.

Read semantics by program point: a read compiled before the variable's
``set`` statement (in execution order, calls inlined) sees the
EXCLUSIVE window (value before this row's update); a read after it
sees the INCLUSIVE window. On rows where the set did not fire the two
windows agree, so branch placement is exact. A never-fired global
reads NULL and inherits the unset-variable coercions (var2String → "",
var2Number → 0) — a ``fired`` count-window distinguishes "sum is 0"
from "never set".

Restrictions (each raises a ValueError at compile):
- one ``set`` per global name (single-assignment window mapping);
- no ``unset $/x``;
- no ``$/`` read may be compiled before the first ``set $/`` — the
  spec inputs (conditions, locals, RHS) would otherwise observe a
  placeholder. Writes-then-reads is the natural accumulator shape.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, Window, functions as F


@dataclass
class GlobalSpec:
    name: str
    tag: str          # "N" for accumulate, RHS tag for last-set
    val_incl: Column  # value including this row's update
    val_excl: Column  # value before this row's update


def _contains_global(ast) -> bool:
    """Any ``$/`` mention in the AST: ("var","$/x") reads, and the bare
    "$/x" strings in set/unset statement position. A false positive
    (a string literal that merely starts with "$/") only costs an
    extra no-op collect pass."""
    if isinstance(ast, str):
        return ast.startswith("$/")
    if isinstance(ast, (list, tuple)):
        return any(_contains_global(a) for a in ast)
    return False


def _split_accum(rhs, name: str):
    """``$/name + E`` / ``E + $/name`` → E's AST, else None."""
    if not (isinstance(rhs, tuple) and rhs[0] == "binop" and rhs[1] == "+"):
        return None
    self_var = ("var", f"$/{name}")
    left, right = rhs[2], rhs[3]
    if left == self_var and not _contains_global(right):
        return right
    if right == self_var and not _contains_global(left):
        return left
    return None


def compile_global_set(
    name: str, rhs, eff: Column, env, order_col: str,
    worker_col: str | None,
) -> GlobalSpec:
    """Compile one ``set $/name = rhs`` (effective predicate ``eff`` =
    path condition ∧ liveness at the statement) into window columns.
    Called from the router's collect pass, where locals/properties in
    scope are already correct."""
    from rsyslog_spark.rules.compiler import _compile, _scalarize, _to_num

    base = Window.partitionBy(
        F.col(worker_col) if worker_col else F.lit(0)
    ).orderBy(order_col)
    incl = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    excl = base.rowsBetween(Window.unboundedPreceding, -1)

    e_ast = _split_accum(rhs, name)
    if e_ast is not None:
        ec, et = _compile(_scalarize(e_ast), env)
        inc = F.when(eff, _to_num(ec, et)).otherwise(F.lit(0).cast("long"))
        fired = F.when(eff, F.lit(1))
        return GlobalSpec(
            name, "N",
            F.when(F.count(fired).over(incl) > 0, F.sum(inc).over(incl)),
            F.when(
                F.count(fired).over(excl) > 0,
                F.coalesce(F.sum(inc).over(excl), F.lit(0).cast("long")),
            ),
        )
    if _contains_global(rhs):
        raise ValueError(
            f"unsupported $/ write form for $/{name}: only "
            f"'set $/{name} = $/{name} + E' (accumulate) or "
            f"'set $/{name} = E' (last-set) with E free of $/ compile "
            "to window aggregates (rules/globals.py)"
        )
    vc, vt = _compile(_scalarize(rhs), env)
    val = F.when(eff, vc)
    return GlobalSpec(
        name, vt,
        F.last(val, ignorenulls=True).over(incl),
        F.last(val, ignorenulls=True).over(excl),
    )


def resolve_global(env, name: str):
    """Env.resolve hook for ``$/name`` reads (compiler.py). Inclusive
    vs exclusive picks on whether the set statement was already passed
    in walk order; never-set names read as the unset variable."""
    g = env.globals.get(name)
    if g is None:
        if not getattr(env, "globals_final", False):
            # collect pass: placeholder — poisons later spec creation
            env.global_placeholder_read = True
        return F.lit(""), "S"
    col = g.val_incl if env.global_set_passed.get(name) else g.val_excl
    if g.tag == "S":
        return F.coalesce(col, F.lit("")), "S"
    return col, g.tag
