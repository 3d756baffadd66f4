"""Route compiler: statement list → per-sink predicate Columns.

rsyslog executes statements sequentially per message with mutable
state (`scriptExec`, /root/reference/runtime/ruleset.c:536-593):
``set`` mutates variables, ``stop`` halts processing, actions fire for
whatever reaches them. We compile this imperative program to pure
dataflow by symbolic execution over Column expressions:

- a *path condition* ``pc`` tracks the enclosing if/else branch
- a *liveness* predicate tracks ``stop`` (ruleset.c:553-555): a stop
  under condition C removes C-rows from every later statement
- ``set $.x`` becomes SSA-style conditional rebinding:
  ``x' = when(pc & live, expr).otherwise(x)`` — exactly the hard part
  called out in SURVEY.md §7
- ``call ruleset`` inlines the callee (depth-capped like
  RULESET_CALL_DEPTH_MAX=1024, ruleset.c:64)
- ``action(...)`` records (sink, pc & live, params); omdiscard is
  rewritten to stop, mirroring cnfstmtOptimize
  (/root/reference/grammar/rainerscript.c:5889-5898)

The result is a single-pass plan: every predicate is evaluated once
over one scan, then either summed (`route_counts`) or fanned out to
sink tables (`write_sinks`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rsyslog_spark.rules.compiler import Env, _compile, _scalarize
from rsyslog_spark.rules.globals import _contains_global
from rsyslog_spark.rules.rscript import parse_script

MAX_CALL_DEPTH = 1024  # ruleset.c:64


@dataclass
class Action:
    sink: str
    predicate: Column
    params: dict = field(default_factory=dict)
    # set for actions inside `foreach`: the array expression and a
    # function elem_col -> per-element predicate. The action fires once
    # per matching ELEMENT (ruleset.c:330-360 iterates and re-executes
    # the body), so counting uses size(filter(arr, pred)) and writing
    # explodes.
    foreach_arr: Column | None = None
    elem_pred: object | None = None


class _State:
    def __init__(self, env: Env):
        self.env = env
        self.live: Column = F.lit(True)
        self.actions: list[Action] = []
        self.rulesets: dict[str, list] = {}
        self.n_anon = 0
        # ruleset names currently being inlined — call_indirect's
        # registry fan-out skips these (a cycle cannot be inlined;
        # the reference bounds runtime recursion at depth 1024)
        self.walking: set[str] = set()
        # r5 `$/` globals: True during the collect pass that compiles
        # window specs for `set $/` (rules/globals.py); the real pass
        # then only flips program-point flags
        self.collect = False


def _sanitize_sink(name: str) -> str:
    """Sink names become `route_<sink>` columns — strip chars that
    F.col would parse as nested-field syntax."""
    import re

    return re.sub(r"[^A-Za-z0-9_]", "_", name).strip("_") or "sink"


def _sink_name(params: dict, state: _State) -> str:
    for k in ("name", "file", "topic", "table"):
        if k in params:
            return _sanitize_sink(str(params[k]))
    state.n_anon += 1
    return f"action{state.n_anon}"


def _walk(stmts: list, pc: Column, state: _State, depth: int = 0) -> None:
    if depth > MAX_CALL_DEPTH:
        raise RecursionError("ruleset call depth exceeded (ref cap 1024)")
    for st in stmts:
        kind = st[0]
        if kind == "nop":
            continue
        if kind == "if":
            cond, _ = _compile(_scalarize(st[1]), state.env)
            cond = F.coalesce(cond.cast("boolean"), F.lit(False))
            _walk(st[2], pc & cond, state, depth)
            if st[3]:
                _walk(st[3], pc & ~cond, state, depth)
        elif kind == "set":
            var = st[1]
            if var.startswith("$/"):
                # global store → window aggregates (rules/globals.py)
                gname = var[2:]
                if not state.collect:
                    state.env.global_set_passed[gname] = (
                        state.env.global_set_passed.get(gname, 0) + 1
                    )
                    continue
                if state.env.global_placeholder_read:
                    raise ValueError(
                        "a $/ read is compiled before the first $/ "
                        "write; write-then-read order is required "
                        "(rules/globals.py)"
                    )
                if state.env.globals_order_col is None:
                    raise ValueError(
                        "script writes $/ globals: compile with "
                        "globals_order=<column> (and optionally "
                        "globals_worker=) — rules/globals.py"
                    )
                from rsyslog_spark.rules.globals import (
                    collect_global_stmt,
                )

                collect_global_stmt(
                    state.env, gname, "set", st[2], pc & state.live
                )
                continue
            if var.startswith("$!"):
                # r5: writes into the message tree (msgAddJSON) — the
                # flat map gets key 'a!b'; reads resolve it first
                from rsyslog_spark.rules.compiler import _to_str

                key = var[2:].strip("!")
                if not key:
                    raise ValueError("cannot set the whole $! tree")
                new, tag = _compile(_scalarize(st[2]), state.env)
                eff = pc & state.live
                tree = (
                    state.env.cee
                    if state.env.cee is not None else F.col("cee")
                )
                state.env.cee = F.when(
                    eff,
                    F.map_concat(  # LAST_WIN dedup = upsert
                        F.coalesce(
                            tree,
                            F.create_map().cast("map<string,string>"),
                        ),
                        F.create_map(F.lit(key), _to_str(new, tag)),
                    ),
                ).otherwise(tree)
                state.env.tree_written = True
                continue
            if not var.startswith("$."):
                raise ValueError(
                    f"can only set $. locals or $! tree keys, got {var}"
                )
            name = var[2:]
            new, tag = _compile(_scalarize(st[2]), state.env)
            old = state.env.locals.get(name)
            eff = pc & state.live
            if old is None:
                col = F.when(eff, new)
            else:
                col = F.when(eff, new).otherwise(old[0])
            state.env.locals[name] = (col, tag)
        elif kind == "unset":
            var = st[1]
            if var.startswith("$/"):
                # unset of a global: a clearing marker at this program
                # point (rules/globals.py segmented model)
                gname = var[2:]
                if not state.collect:
                    state.env.global_set_passed[gname] = (
                        state.env.global_set_passed.get(gname, 0) + 1
                    )
                    continue
                if state.env.globals_order_col is None:
                    raise ValueError(
                        "script writes $/ globals: compile with "
                        "globals_order=<column> — rules/globals.py"
                    )
                from rsyslog_spark.rules.globals import (
                    collect_global_stmt,
                )

                collect_global_stmt(
                    state.env, gname, "unset", None, pc & state.live
                )
                continue
            if var.startswith("$!"):
                key = var[2:].strip("!")
                eff = pc & state.live
                tree = (
                    state.env.cee
                    if state.env.cee is not None else F.col("cee")
                )
                state.env.cee = F.when(
                    eff,
                    F.map_filter(tree, lambda k, _v: k != F.lit(key)),
                ).otherwise(tree)
                state.env.tree_written = True
                continue
            name = var[2:]
            old = state.env.locals.get(name)
            if old is not None:
                eff = pc & state.live
                state.env.locals[name] = (
                    F.when(~eff, old[0]),
                    old[1],
                )
        elif kind == "stop":
            state.live = state.live & ~pc
        elif kind == "action":
            params = st[1]
            if str(params.get("type", "")).lower() == "omdiscard":
                state.live = state.live & ~pc
                continue
            pred = pc & state.live
            state.actions.append(
                Action(_sink_name(params, state), pred, params)
            )
            state.env.last_action_pred = pred  # previous_action_suspended()
        elif kind == "foreach":
            _compile_foreach(st, pc, state)
        elif kind == "call_rs":
            callee = state.rulesets.get(st[1])
            if callee is None:
                raise ValueError(f"unknown ruleset {st[1]!r}")
            _walk(callee, pc, state, depth + 1)
        elif kind == "call_ind":
            # S_CALL_INDIRECT (grammar/rainerscript.h:123; runtime
            # execCallIndirect, ruleset.c:235-275): the callee name is
            # an EXPRESSION evaluated per message; a name that matches
            # no ruleset is a NOP. A literal name resolves at compile
            # time (raising on a missing ruleset — a static typo
            # should not silently NOP; documented divergence from the
            # reference's logged-error-NOP). A dynamic expression fans
            # out over the finite ruleset registry — each callee
            # inlined under pc & (expr == name), the compile-time
            # image of rulesetGetRuleset: rows whose name matches no
            # registered ruleset fall through every gate (NOP).
            from rsyslog_spark.rules.compiler import _to_str

            if st[1][0] == "str":
                callee = state.rulesets.get(st[1][1])
                if callee is None:
                    raise ValueError(
                        f"unknown ruleset {st[1][1]!r} in call_indirect"
                    )
                if st[1][1] not in state.walking:
                    state.walking.add(st[1][1])
                    try:
                        _walk(callee, pc, state, depth + 1)
                    finally:
                        state.walking.discard(st[1][1])
            else:
                ncol, ntag = _compile(_scalarize(st[1]), state.env)
                ncol = _to_str(ncol, ntag)
                for rs_name, body in list(state.rulesets.items()):
                    if rs_name in state.walking:
                        continue  # self/mutual cycle: not inlinable
                    state.walking.add(rs_name)
                    try:
                        _walk(
                            body, pc & (ncol == F.lit(rs_name)),
                            state, depth + 1,
                        )
                    finally:
                        state.walking.discard(rs_name)
        elif kind == "ruleset":
            state.rulesets[st[1]] = st[2]
        elif kind == "template":
            # template(name=.. type=string|list|subtree ..) objects
            # (runtime/template.c:2149 tplProcessCnf)
            params, body = st[1], st[2]
            name = params.get("name")
            if not name:
                raise ValueError("template(...) needs name=")
            ttype = str(params.get("type", "string")).lower()
            if ttype == "string":
                state.env.templates[name] = params.get("string", "")
            elif ttype == "list":
                from rsyslog_spark.templates import compile_list_stmts

                state.env.compiled_templates[name] = compile_list_stmts(
                    body, state.env
                )
            elif ttype == "subtree":
                from rsyslog_spark.templates import compile_subtree

                state.env.compiled_templates[name] = compile_subtree(
                    params.get("subtree", "$!"), state.env
                )
            else:
                raise ValueError(
                    f"unsupported template type {ttype!r} "
                    "(string/list/subtree)"
                )
        else:
            raise ValueError(f"unsupported statement {kind}")


def _leaf_stmts(stmts):
    """Yield non-`if` statements of a foreach body, recursing through
    if/else arms."""
    for s in stmts:
        if s[0] == "if":
            yield from _leaf_stmts(s[2])
            if s[3]:
                yield from _leaf_stmts(s[3])
        else:
            yield s


def _compile_foreach_fold(
    vname: str, coll_tag: str, arr_col: Column, body, pc: Column,
    state: _State,
) -> None:
    """`set` of outer `$.` locals inside foreach — the reference's
    accumulator pattern (scriptExec re-runs the body per element with
    shared mutable vars, ruleset.c:310-401):

        foreach ($.x in $!items) do { set $.sum = $.sum + $.x; }

    Compiled as ONE aggregate() fold over the collection: the
    accumulator struct carries every mutated local (stringly, tag
    'S' — RainerScript locals round-trip through var2String/var2Number
    exactly like a chain of top-level sets, and numbers are int64 so
    the round-trip is lossless), and the body is symbolically executed
    inside the merge lambda with the loop var + accumulators bound.
    `if` arms become per-element path conditions; sequential sets in
    one iteration see earlier sets' values (cur updates in place).
    After the loop each mutated local rebinds SSA-style under
    pc & live, so rows the foreach didn't reach keep their old value —
    and a NULL/non-array collection folds zero elements (coalesce to
    the init struct), matching the reference's silent no-op.

    Bodies mixing `set` with actions raise (see _compile_foreach):
    mid-iteration accumulator observation needs a prefix scan, which
    is O(L^2) as a Column expression. Each mutated local extracts one
    field from the fold; the fold expression is copied per local
    inside its CASE rebinding (codegen CSE does not dedupe CASE-branch
    copies), so keep the accumulator set small — in practice 1-3."""
    from rsyslog_spark.rules.compiler import _to_str

    names: list[str] = []
    for s in _leaf_stmts(body):
        if s[0] == "nop":
            continue
        v = s[1]
        if not v.startswith("$."):
            raise ValueError(
                f"only $. locals may be set inside foreach, got {v}"
            )
        n = v[2:]
        if n == vname or n.startswith(vname + "!"):
            raise ValueError(f"cannot set the loop variable {v}")
        if n not in names:
            names.append(n)

    env = state.env
    init = F.struct(*[
        (
            _to_str(*env.locals[n]) if n in env.locals
            else F.lit(None).cast("string")
        ).alias(n)
        for n in names
    ])

    def bind_loop_var(elem) -> dict:
        if coll_tag == "M":
            return {
                vname: (F.to_json(elem), "S"),
                vname + "!key": (elem["key"], "S"),
                vname + "!value": (elem["value"], "S"),
            }
        return {vname: (elem, "S")}

    def merge(acc, elem):
        cur = {n: acc[n] for n in names}
        binds = bind_loop_var(elem)
        saved = {
            k: env.locals.get(k) for k in set(binds) | set(names)
        }

        def rebind():
            env.locals.update(binds)
            for n in names:
                env.locals[n] = (cur[n], "S")

        def run(stmts, epc):
            for s in stmts:
                if s[0] == "nop":
                    continue
                if s[0] == "if":
                    rebind()
                    cond, _ = _compile(_scalarize(s[1]), env)
                    cond = F.coalesce(
                        cond.cast("boolean"), F.lit(False)
                    )
                    run(s[2], epc & cond)
                    if s[3]:
                        run(s[3], epc & ~cond)
                else:  # set
                    n = s[1][2:]
                    rebind()
                    new, tag = _compile(_scalarize(s[2]), env)
                    cur[n] = F.when(
                        epc, _to_str(new, tag)
                    ).otherwise(cur[n])

        try:
            run(body, F.lit(True))
        finally:
            for k, old in saved.items():
                if old is None:
                    env.locals.pop(k, None)
                else:
                    env.locals[k] = old
        return F.struct(*[cur[n].alias(n) for n in names])

    folded = F.coalesce(F.aggregate(arr_col, init, merge), init)
    eff = pc & state.live
    for n in names:
        old = env.locals.get(n)
        col = F.when(eff, folded[n])
        if old is not None:
            col = col.otherwise(_to_str(*old))
        env.locals[n] = (col, "S")


def _compile_foreach(st, pc: Column, state: _State) -> None:
    """foreach ($.x in expr) do BODY — body actions fire per element.

    The loop variable is bound lazily: each body action's element
    predicate is a *function* of the lambda variable, evaluated inside
    size(filter(arr, ...)) (counting) or on the exploded element
    (writing). Body subset: if / action / nop — or if / set / nop,
    which compiles to an aggregate() fold instead (the reference's
    shared-mutable-accumulator pattern; see _compile_foreach_fold).
    Bodies mixing actions with sets raise.

    OBJECT iteration (callForeachObject, ruleset.c:334-372): when the
    collection compiles map-typed (tag 'M' — the whole ``$!`` tree,
    parse_json(...), …), the reference binds the loop variable to a
    fresh ``{key, value}`` object per entry. Compiled Spark-side as
    ``map_entries(map)`` → array of (key,value) structs, with
    ``$.var!key`` / ``$.var!value`` bound to the struct fields and the
    bare ``$.var`` to its JSON rendering (what a template sees). The
    reference picks array-vs-object per MESSAGE at runtime; a Column
    expression is statically typed, so here the collection's compiled
    type decides — same dispatch, resolved at compile time."""
    _, var, arr_ast, body = st
    arr_col, coll_tag = _compile(_scalarize(arr_ast), state.env)
    vname = var[2:]
    if coll_tag == "M":
        arr_col = F.map_entries(arr_col)

    kinds = {s[0] for s in _leaf_stmts(body)}
    if "set" in kinds:
        if not kinds <= {"set", "nop"}:
            raise ValueError(
                "foreach bodies may contain either actions or `set` "
                "statements, not both: a body action observes the "
                "accumulator mid-iteration, which a single fold "
                "cannot express (split the script: fold first, then "
                "a second foreach over the same collection)"
            )
        _compile_foreach_fold(
            vname, coll_tag, arr_col, body, pc, state
        )
        return

    if coll_tag == "M":

        def bind(elem) -> dict:
            return {
                vname: (F.to_json(elem), "S"),
                vname + "!key": (elem["key"], "S"),
                vname + "!value": (elem["value"], "S"),
            }
    else:

        def bind(elem) -> dict:
            return {vname: (elem, "S")}

    def walk_body(stmts, elem, epc):
        """Walk body with $.var (and, for objects, $.var!key /
        $.var!value) bound to `elem`; returns list of
        (sink, elem_predicate, params)."""
        found = []
        binds = bind(elem)
        saved = {k: state.env.locals.get(k) for k in binds}
        state.env.locals.update(binds)
        try:
            for s in stmts:
                if s[0] == "nop":
                    continue
                if s[0] == "if":
                    cond, _ = _compile(_scalarize(s[1]), state.env)
                    cond = F.coalesce(cond.cast("boolean"), F.lit(False))
                    found += walk_body(s[2], elem, epc & cond)
                    if s[3]:
                        found += walk_body(s[3], elem, epc & ~cond)
                elif s[0] == "action":
                    found.append((_sink_name(s[1], state), epc, s[1]))
                else:
                    raise ValueError(
                        f"unsupported statement {s[0]!r} inside foreach"
                    )
        finally:
            for k, old in saved.items():
                if old is None:
                    state.env.locals.pop(k, None)
                else:
                    state.env.locals[k] = old
        return found

    # discover actions once to fix sink names, then rebind per call
    probe = walk_body(body, F.lit(None), F.lit(True))
    for idx, (sink, _p, params) in enumerate(probe):
        def make_pred(i=idx):
            def elem_pred(elem: Column) -> Column:
                got = walk_body(body, elem, F.lit(True))
                return got[i][1]

            return elem_pred

        ep = make_pred()
        any_match = F.size(F.filter(arr_col, lambda e: ep(e))) > 0
        state.actions.append(
            Action(
                sink,
                pc & state.live & F.coalesce(any_match, F.lit(False)),
                params,
                foreach_arr=arr_col,
                elem_pred=ep,
            )
        )


def compile_routes(
    script: str | list, env: Env | None = None, entry: str | None = None,
    globals_order: str | None = None, globals_worker: str | None = None,
) -> tuple[list[Action], Env]:
    """Compile a RainerScript routing program.

    Top-level ``ruleset(name=...){...}`` blocks are registered; the
    entry point is ``entry`` if given, else a ruleset named "main",
    else the bare top-level statements.

    ``globals_order``/``globals_worker``: required when the script
    writes ``$/`` globals — the total order (and optional worker-store
    shard key) for the window mapping (rules/globals.py). Scripts with
    globals compile in two passes: a collect pass builds each global's
    window spec at its ``set`` site (with path condition, liveness and
    locals all in scope), then the real pass resolves reads against
    those specs by program point.
    """
    stmts = parse_script(script) if isinstance(script, str) else script
    env = env or Env()
    env.globals_order_col = globals_order
    env.globals_worker_col = globals_worker

    def _run_pass(collect: bool) -> _State:
        state = _State(env)
        state.collect = collect
        for s in stmts:
            if s[0] == "ruleset":
                state.rulesets[s[1]] = s[2]
        if entry is not None:
            program = state.rulesets[entry]
            state.walking.add(entry)
        else:
            program = state.rulesets.get("main",
                                         [x for x in stmts
                                          if x[0] != "ruleset"])
            if "main" in state.rulesets:
                state.walking.add("main")
        _walk(program, F.lit(True), state)
        return state

    if _contains_global(stmts):
        _run_pass(collect=True)
        from rsyslog_spark.rules.globals import finalize_globals

        finalize_globals(env)
        # reset per-pass compilation state; keep the compiled globals
        env.globals_final = True
        env.locals.clear()
        env.cee = None
        env.tree_written = False
        env.last_action_pred = None
    state = _run_pass(collect=False)
    # a sink reached from several inlined call sites (call_indirect
    # fan-out, repeated call) would otherwise emit duplicate
    # route_<sink> columns — OR-merge them, the same "two rulesets
    # appending to one file" convention BoundRouter uses
    merged: dict[str, Action] = {}
    for a in state.actions:
        prev = merged.get(a.sink)
        if prev is None:
            merged[a.sink] = a
        elif (
            prev.foreach_arr is None
            and a.foreach_arr is None
            and prev.params == a.params
        ):
            # identical sink + params from two call sites: one column,
            # OR-merged predicates ("two rulesets appending to one
            # file"). DIFFERING params must not silently adopt the
            # first action's config (code-review r5) — fall through to
            # the disambiguated-name branch instead.
            merged[a.sink] = Action(
                a.sink, prev.predicate | a.predicate, prev.params
            )
        else:
            # foreach actions iterate distinct arrays — not mergeable;
            # keep both under a disambiguated sink name
            i = 2
            while f"{a.sink}_{i}" in merged:
                i += 1
            merged[f"{a.sink}_{i}"] = Action(
                f"{a.sink}_{i}", a.predicate, a.params,
                a.foreach_arr, a.elem_pred,
            )
    return list(merged.values()), env




class Router:
    """Applies compiled routes to a DataFrame as boolean columns."""

    def __init__(self, script: str, env: Env | None = None,
                 globals_order: str | None = None,
                 globals_worker: str | None = None):
        self.actions, self.env = compile_routes(
            script, env,
            globals_order=globals_order, globals_worker=globals_worker,
        )

    @property
    def sinks(self) -> list[str]:
        return [a.sink for a in self.actions]

    def apply(self, df: DataFrame, keep_locals: bool = False) -> DataFrame:
        """Add one boolean ``route_<sink>`` column per action — a single
        narrow projection, no shuffle, evaluated in one pass. When the
        script wrote into ``$!`` (set $!k), the ``cee`` column is
        replaced by the rewritten tree (created as an empty map first
        if the input has no tree yet)."""
        if self.env.tree_written and "cee" not in df.columns:
            df = df.withColumn(
                "cee", F.create_map().cast("map<string,string>")
            )
        cols = [
            F.coalesce(a.predicate, F.lit(False)).alias(f"route_{a.sink}")
            for a in self.actions
        ]
        if keep_locals:
            cols += [
                col.alias(f"local_{name}")
                for name, (col, _t) in self.env.locals.items()
            ]
        base = [
            (self.env.cee.alias("cee")
             if c == "cee" and self.env.cee is not None else F.col(c))
            for c in df.columns
        ]
        return df.select(*base, *cols)

    def route_counts(self, df: DataFrame) -> DataFrame:
        """Per-sink routed-row counts in ONE aggregation job (no cache,
        no second scan): sum of predicate ints. foreach actions count
        per matching ELEMENT (size of the filtered array)."""
        routed = self.apply(df)
        aggs = []
        for a in self.actions:
            if a.foreach_arr is not None:
                per_row = F.when(
                    F.col(f"route_{a.sink}"),
                    F.size(F.filter(a.foreach_arr, lambda e: a.elem_pred(e))),
                ).otherwise(F.lit(0))
                aggs.append(F.sum(per_row.cast("long")).alias(a.sink))
            else:
                aggs.append(
                    F.sum(F.col(f"route_{a.sink}").cast("long")).alias(a.sink)
                )
        wide = routed.agg(*aggs)
        # unpivot to (sink, n) rows
        pairs = []
        for a in self.actions:
            pairs += [F.lit(a.sink), F.col(a.sink)]
        return wide.select(
            F.explode(F.create_map(*pairs)).alias("sink", "n")
        )

    def write_sinks(
        self,
        df: DataFrame,
        base_path: str,
        fmt: str = "parquet",
        partition_by: dict[str, list[str]] | None = None,
    ) -> dict[str, str]:
        """Single-pass multi-sink write (SURVEY.md §2.10): materialize
        the routed scan once, then each sink writes its filtered slice.
        ``partition_by`` maps sink → partition columns (the omfile
        dynafile-template ≙ partitionBy analogy, tools/omfile.c:133)."""
        routed = self.apply(df)
        routed.persist()
        try:
            out = {}
            for a in self.actions:
                path = f"{base_path}/{a.sink}"
                w = routed.filter(F.col(f"route_{a.sink}")).drop(
                    *[f"route_{x.sink}" for x in self.actions]
                )
                if a.foreach_arr is not None:
                    # one output row per matching element
                    w = w.withColumn(
                        "item",
                        F.explode(
                            F.filter(a.foreach_arr, lambda e: a.elem_pred(e))
                        ),
                    )
                pb = (partition_by or {}).get(a.sink)
                writer = w.write.mode("overwrite")
                if pb:
                    writer = writer.partitionBy(*pb)
                writer.format(fmt).save(path)
                out[a.sink] = path
            return out
        finally:
            routed.unpersist()


class BoundRouter(Router):
    """Per-input ruleset binding (SURVEY §2.5: each message carries its
    ruleset, ruleset.c:614 / msg.h:104).

    ``bindings`` maps a `source` value to a ruleset name from the
    script; unbound sources run ``default`` (or the bare "main"
    program). Each ruleset's actions are compiled independently and
    gated on `source == value`; actions landing in the same sink from
    different rulesets are merged with OR — matching the reference,
    where two rulesets writing the same file append to it.
    """

    def __init__(
        self,
        script: str,
        bindings: dict[str, str],
        default: str | None = None,
        env: Env | None = None,
        source_col: str = "source",
    ):
        from rsyslog_spark.rules.rscript import parse_script as _ps

        stmts = _ps(script)
        base_env = env or Env()
        merged: dict[str, Action] = {}

        def add(actions: list[Action], gate: Column):
            for a in actions:
                pred = a.predicate & gate
                if a.sink in merged:
                    prev = merged[a.sink]
                    merged[a.sink] = Action(
                        a.sink, prev.predicate | pred, prev.params,
                        prev.foreach_arr, prev.elem_pred,
                    )
                else:
                    merged[a.sink] = Action(
                        a.sink, pred, a.params, a.foreach_arr, a.elem_pred
                    )

        for src_value, rs_name in bindings.items():
            sub_env = Env()
            sub_env.props.update(base_env.props)
            sub_env.lookups = base_env.lookups
            sub_env.templates = base_env.templates
            actions, _ = compile_routes(stmts, sub_env, entry=rs_name)
            add(actions, F.col(source_col) == src_value)

        unbound = ~F.col(source_col).isin(list(bindings)) | F.col(
            source_col
        ).isNull()
        if default is not None:
            sub_env = Env()
            sub_env.props.update(base_env.props)
            sub_env.lookups = base_env.lookups
            sub_env.templates = base_env.templates
            actions, _ = compile_routes(stmts, sub_env, entry=default)
            add(actions, unbound)

        self.env = base_env
        self.actions = list(merged.values())
