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

Write forms (r5 continuation: ANY mix of these per name, any number of
statements — the former single-assignment restriction is lifted):

- accumulate — ``set $/x = $/x + E`` (or ``E + $/x``), E free of
  ``$/``: adds ``when(path-cond ∧ live, var2Number(E))`` to the store.
- assign — ``set $/x = E``, E free of ``$/``: replaces the value.
- ``unset $/x``: clears it (subsequent reads see the unset variable —
  var2String "" / var2Number 0 — until the next write).

The compilation is SEGMENTED: assigns/unsets are markers carrying the
running accumulate-sum and fired-count AT THEIR OWN program point, so
value-after-point-k = marker.value + (delta_sum_k − marker.delta_sum)
— one window pass per name regardless of statement count, never an
iterative fold. Reads are program-point exact: a read between two
statements of the same row sees exactly the writes at or before its
point (statements inlined from ``call`` sites count per call site).
A never-written (or currently-unset) global reads NULL and inherits
the unset-variable coercions.

Still unsupported (raises with a pointer): a ``$/`` RHS that reads a
DIFFERENT global or uses the self-reference in a non-``+`` shape
(``$/x * 2``) — those need a true sequential fold, which is the one
thing a window aggregate cannot express.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, Window, functions as F

#: RainerScript tag → Spark type for typed NULLs in unset markers
_TAG_TYPE = {"N": "long", "S": "string", "B": "boolean"}


@dataclass
class GlobalStmt:
    kind: str          # 'acc' | 'set' | 'unset'
    eff: Column        # path condition ∧ liveness at the statement
    val: Column | None  # acc: numeric delta; set: RHS value; unset: None
    tag: str           # acc: 'N'; set: RHS tag; unset: ''


@dataclass
class GlobalSpec:
    name: str
    tag: str
    #: value column by program point: [0] = before any statement of
    #: this name, [k] = after its k-th statement (walk order)
    val_points: list[Column]


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


def collect_global_stmt(env, name: str, kind: str, rhs, eff: Column) -> None:
    """Record one ``set $/name = rhs`` / ``unset $/name`` during the
    router's collect pass. RHS pieces are compiled HERE (locals and
    path conditions are in scope at the statement site); the window
    assembly happens in :func:`finalize_globals` once every statement
    of the script is known."""
    from rsyslog_spark.rules.compiler import _compile, _scalarize, _to_num

    stmts = env.global_stmts.setdefault(name, [])
    if kind == "unset":
        stmts.append(GlobalStmt("unset", eff, None, ""))
        return
    e_ast = _split_accum(rhs, name)
    if e_ast is not None:
        ec, et = _compile(_scalarize(e_ast), env)
        stmts.append(GlobalStmt("acc", eff, _to_num(ec, et), "N"))
        return
    if _contains_global(rhs):
        raise ValueError(
            f"unsupported $/ write form for $/{name}: the RHS may "
            f"reference $/{name} only as '$/{name} + E' (accumulate) "
            "and may not read other globals — a cross-global or "
            "multiplicative self-reference needs a sequential fold "
            "no window aggregate expresses (rules/globals.py)"
        )
    vc, vt = _compile(_scalarize(rhs), env)
    stmts.append(GlobalStmt("set", eff, vc, vt))


def finalize_globals(env) -> None:
    """Build each global's per-program-point value columns from its
    collected statements (one window pass per name)."""
    from rsyslog_spark.rules.compiler import _to_num, _to_str

    order_col = env.globals_order_col
    worker_col = env.globals_worker_col
    base = Window.partitionBy(
        F.col(worker_col) if worker_col else F.lit(0)
    ).orderBy(order_col)
    incl = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    excl = base.rowsBetween(Window.unboundedPreceding, -1)
    zero = F.lit(0).cast("long")

    for name, stmts in env.global_stmts.items():
        numeric = any(s.kind == "acc" for s in stmts)
        set_tags = {s.tag for s in stmts if s.kind == "set"}
        if numeric:
            tag = "N"

            def vcol(s):
                return _to_num(s.val, s.tag)
        elif len(set_tags) == 1:
            tag = set_tags.pop()

            def vcol(s):
                return s.val
        else:
            tag = "S"

            def vcol(s):
                return _to_str(s.val, s.tag)
        vtype = _TAG_TYPE.get(tag, "string")
        K = len(stmts)
        has_marker = any(s.kind in ("set", "unset") for s in stmts)

        # running accumulate sum / fired count by program point:
        # D[k], Fi[k] = value at point k (0 = before this row's stmts)
        if numeric:
            deltas = [
                F.when(s.eff, vcol(s)).otherwise(zero)
                if s.kind == "acc" else zero
                for s in stmts
            ]
            fires = [
                F.when(s.eff, F.lit(1).cast("long")).otherwise(zero)
                if s.kind == "acc" else zero
                for s in stmts
            ]
            full_delta = deltas[0]
            full_fire = fires[0]
            for d, f in zip(deltas[1:], fires[1:]):
                full_delta = full_delta + d
                full_fire = full_fire + f
            D = [F.coalesce(F.sum(full_delta).over(excl), zero)]
            Fi = [F.coalesce(F.sum(full_fire).over(excl), zero)]
            for i in range(K):
                D.append(D[-1] + deltas[i])
                Fi.append(Fi[-1] + fires[i])

        # assign/unset markers carry (kind, value, delta-sum and
        # fired-count at their own point) — the segment base
        evs: list[Column | None] = []
        for i, s in enumerate(stmts):
            if s.kind == "acc":
                evs.append(None)
                continue
            if s.kind == "unset":
                v = F.lit(None).cast(vtype)
                k_lit = F.lit(2)
            else:
                v = vcol(s)
                k_lit = F.lit(1)
            ds = D[i + 1] if numeric else zero
            nf = Fi[i + 1] if numeric else zero
            evs.append(
                F.when(
                    s.eff,
                    F.struct(
                        k_lit.alias("k"), v.alias("v"),
                        ds.alias("ds"), nf.alias("nf"),
                    ),
                )
            )
        if has_marker:
            present = [e for e in evs if e is not None]
            full_ev = (
                present[0] if len(present) == 1
                else F.coalesce(*reversed(present))
            )
            last_prev = F.last(full_ev, ignorenulls=True).over(excl)

        vals: list[Column] = []
        for k in range(K + 1):
            mk = None
            if has_marker:
                upto = [e for e in evs[:k] if e is not None]
                mk = (
                    F.coalesce(*(list(reversed(upto)) + [last_prev]))
                    if upto else last_prev
                )
            if numeric:
                never = F.when(Fi[k] > 0, D[k])
                if mk is None:
                    vals.append(never)
                else:
                    vals.append(
                        F.when(mk.isNull(), never)
                        .when(
                            mk["k"] == 2,
                            F.when(Fi[k] > mk["nf"], D[k] - mk["ds"]),
                        )
                        .otherwise(mk["v"] + (D[k] - mk["ds"]))
                    )
            else:
                vals.append(
                    F.when(mk.isNotNull() & (mk["k"] == 1), mk["v"])
                )
        env.globals[name] = GlobalSpec(name, tag, vals)


def resolve_global(env, name: str):
    """Env.resolve hook for ``$/name`` reads (compiler.py). The value
    column is picked by program point — how many of this name's
    statements the real pass has already walked. A read compiled with
    no spec (collect pass, or a name never written) returns the unset
    placeholder; during collect, a read of a name with NO statement
    recorded yet poisons later spec creation (write-then-read order)."""
    g = env.globals.get(name)
    if g is None:
        if (
            not getattr(env, "globals_final", False)
            and name not in env.global_stmts
        ):
            # collect pass, before any write of this name: placeholder
            env.global_placeholder_read = True
        return F.lit(""), "S"
    idx = min(env.global_set_passed.get(name, 0), len(g.val_points) - 1)
    col = g.val_points[idx]
    if g.tag == "S":
        return F.coalesce(col, F.lit("")), "S"
    return col, g.tag
