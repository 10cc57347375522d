"""Single-ml-trainer-baseline enforcement (r10 VERDICT #3).

The registry keeps exactly ONE query that trains a quantizer through
the pyspark.ml KMeans backend — sim_ivf_topk, the deliberate
distributed-fit recall baseline. Every other trainer-bearing call in
the workload package must pass ``train_backend="local"`` (the capped
driver-side fit: one sample-scan job instead of ~20 tiny per-iteration
jobs per codebook — the r9/r10 25 s lesson).

Enforced statically over the workload sources: any call to the
trainer-bearing entry points (ivf_topk / pq_topk / ivf_pq_topk, plus
the underlying _train_centroid_list / pq_train_codebooks) that omits
train_backend or passes "ml" is a violation unless it sits inside the
sim_ivf_topk registration. Static, so a new wave file cannot
reintroduce a full-corpus ml fit without tripping CI.
"""

from __future__ import annotations

import ast
import glob
import os

WORKLOAD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "etl_neotel_sql_automation_spark",
    "workload",
)

TRAINER_FUNCS = {
    "ivf_topk",
    "pq_topk",
    "ivf_pq_topk",
    "_train_centroid_list",
    "pq_train_codebooks",
}

ALLOWED = {("llm_ops.py", "sim_ivf_topk")}


class _Visitor(ast.NodeVisitor):
    def __init__(self, fname: str):
        self.fname = fname
        self.stack: list[str] = []
        self.violations: list[tuple[str, str, int]] = []

    def visit_FunctionDef(self, node):  # noqa: N802
        self.stack.append(node.name)
        self.generic_visit(node)
        self.stack.pop()

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_Call(self, node):  # noqa: N802
        callee = node.func
        name = None
        if isinstance(callee, ast.Attribute):
            name = callee.attr
        elif isinstance(callee, ast.Name):
            name = callee.id
        if name in TRAINER_FUNCS:
            backend = "ml"  # the default
            for kw in node.keywords:
                if kw.arg == "train_backend" and isinstance(kw.value, ast.Constant):
                    backend = kw.value.value
            if backend != "local":
                ctx = self.stack[-1] if self.stack else "<module>"
                if (self.fname, ctx) not in ALLOWED:
                    self.violations.append((self.fname, ctx, node.lineno))
        self.generic_visit(node)


def test_single_ml_trainer_baseline():
    violations = []
    found_baseline = False
    for path in sorted(glob.glob(os.path.join(WORKLOAD, "*.py"))):
        fname = os.path.basename(path)
        with open(path) as f:
            tree = ast.parse(f.read())
        v = _Visitor(fname)
        v.visit(tree)
        violations.extend(v.violations)
        if fname == "llm_ops.py":
            # the allowed baseline must actually exist and use ml
            for node in ast.walk(tree):
                if isinstance(node, ast.FunctionDef) and node.name == "sim_ivf_topk":
                    found_baseline = True
    assert found_baseline, "sim_ivf_topk baseline registration vanished"
    assert not violations, (
        "full-corpus pyspark.ml trainer outside the single designated "
        f"baseline (sim_ivf_topk): {violations} - pass "
        'train_backend="local" (r10 VERDICT #3)'
    )
