"""Round-11 ADVICE regression pins (one test per adjudicated r10 finding).

All three r10 findings are audit-infrastructure bugs (the engine itself was
clean): the collect-in-loop guard's regex body pattern stopped at the first
blank line, the collect/toPandas ratchet counted substrings (missing sites
hidden in strings, counting phantom sites in docstrings), and bench.py's
mid-run host-speed timeline skipped a probe whenever a FAILED query landed
exactly on a multiple of 50. The first two are fixed by moving both checks
onto the AST (tests/test_collect_allowlist.py); the third by sampling the
timeline before the failure early-exit (bench.py). These pins make each
fix regress loudly:

- the loop guard must catch a ``.collect()`` placed after a blank line
  inside a ``for`` body, inside a ``while`` body, and in a ``while`` TEST
  (re-evaluated per iteration) — and must NOT flag ``for r in
  df.collect():`` (one call, result iterated);
- the site counter must ignore ``.collect(`` inside string literals and
  docstrings (even ones containing ``#``) and must count real call sites
  on continuation lines after a ``#`` appears earlier in the line;
- bench.py's timeline block must execute on the failure path (pinned
  structurally: the probe append is no longer guarded by the
  ``if not runs`` early-continue).
"""
import ast
import textwrap

from tests.test_collect_allowlist import _is_method_call


def _loop_guard_hits(src):
    """Re-implementation of the guard's per-tree walk over an arbitrary
    source string (the test module walks the real package; this drives the
    same predicate over crafted repros)."""
    tree = ast.parse(textwrap.dedent(src))
    hits = 0
    for node in ast.walk(tree):
        if not isinstance(node, (ast.For, ast.AsyncFor, ast.While)):
            continue
        repeated = list(node.body) + list(node.orelse)
        if isinstance(node, ast.While):
            repeated.append(node.test)
        if any(
            _is_method_call(sub, "collect")
            for stmt in repeated
            for sub in ast.walk(stmt)
        ):
            hits += 1
    return hits


# --- finding 1 (low): loop-guard regex stopped at the first blank line ---


def test_loop_guard_sees_collect_after_a_blank_line():
    """The r10 regex body pattern ``(?:\\1\\s+.*\\n?)+`` ended the captured
    body at the first empty line, so this exact shape escaped detection."""
    src = """
    for batch in batches:
        prep = stage(batch)

        rows = df.filter(prep).collect()
    """
    assert _loop_guard_hits(src) == 1


def test_loop_guard_sees_while_bodies_and_tests():
    assert _loop_guard_hits("""
    while df.limit(1).collect():
        step()
    """) == 1
    assert _loop_guard_hits("""
    while not done:
        state = df.collect()
    """) == 1


def test_loop_guard_ignores_collect_as_the_for_iterable():
    """``for r in cov.collect():`` is ONE driver materialization whose
    result is iterated — the bounded-collect ratchet covers it; the
    ITERATIVE guard must not (pca.py's d²-bounded moment collect is the
    in-package instance)."""
    assert _loop_guard_hits("""
    for r in cov.collect():
        C[r.i][r.j] = r.cov
    """) == 0


# --- finding 2 (low): substring site counts drift for non-code reasons ---


def test_site_counter_ignores_strings_and_docstrings():
    """The r10 counter stripped after the first ``#`` then counted raw
    substrings: ``.collect(`` inside a string containing ``#`` was MISSED,
    and ``.collect(`` in a docstring COUNTED. The AST sees neither."""
    tree = ast.parse(textwrap.dedent('''
    def f(df):
        """Never calls .collect( on the corpus."""
        msg = "see #4: df.collect( is banned here"
        return df
    '''))
    assert sum(1 for n in ast.walk(tree) if _is_method_call(n, "collect")) == 0


def test_site_counter_sees_real_sites_the_line_stripper_lost():
    """A real call site on a continuation line after a ``#`` inside a
    string earlier in the same logical line was stripped away by the
    line-based counter; the AST counts it."""
    tree = ast.parse(textwrap.dedent("""
    def f(df):
        rows = df.filter("tag != '#x'").collect()
        pdf = df.toPandas()
        return rows, pdf
    """))
    assert sum(1 for n in ast.walk(tree) if _is_method_call(n, "collect")) == 1
    assert sum(1 for n in ast.walk(tree) if _is_method_call(n, "toPandas")) == 1


# --- finding 3 (low): bench timeline skipped when the Nth query fails ----


def test_bench_timeline_probe_is_not_behind_the_failure_continue():
    """Structural pin on bench.py's run loop: the ``probe_timeline``
    append must not be skippable by the failed-query path. Concretely:
    inside the per-query ``for`` loop, no ``continue`` may appear between
    the ``times[name] = float("inf")`` failure assignment and the
    ``probe_timeline.append`` — the r10 shape (``continue`` directly after
    the inf assignment) left a 100-query evidence gap whenever the
    50th/100th/150th entry was a failure."""
    import bench

    src = open(bench.__file__).read()
    tree = ast.parse(src)
    run_loops = [
        node
        for node in ast.walk(tree)
        if isinstance(node, ast.For)
        and any(
            isinstance(sub, ast.Attribute) and sub.attr == "append"
            and isinstance(sub.value, ast.Name)
            and sub.value.id == "probe_timeline"
            for sub in ast.walk(node)
        )
    ]
    assert run_loops, "bench.py run loop with probe_timeline.append not found"
    loop = run_loops[0]
    inf_line = None
    append_line = None
    for sub in ast.walk(loop):
        if (
            isinstance(sub, ast.Assign)
            and isinstance(sub.value, ast.Call)
            and ast.unparse(sub.value) == "float('inf')"
        ):
            inf_line = sub.lineno
        if (
            isinstance(sub, ast.Call)
            and isinstance(sub.func, ast.Attribute)
            and sub.func.attr == "append"
            and isinstance(sub.func.value, ast.Name)
            and sub.func.value.id == "probe_timeline"
        ):
            append_line = sub.lineno
    assert inf_line is not None and append_line is not None
    bad_continues = [
        sub.lineno
        for sub in ast.walk(loop)
        if isinstance(sub, ast.Continue) and inf_line <= sub.lineno < append_line
    ]
    assert not bad_continues, (
        "bench.py: a `continue` between the failure assignment "
        f"(line {inf_line}) and the timeline probe (line {append_line}) "
        f"at {bad_continues} would drop probe samples on failed queries"
    )
