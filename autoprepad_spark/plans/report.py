"""HTML run-report sink — the S5 analog.

The reference writes an estimator HTML repr plus an optional
ydata-profiling report (/root/reference/pipelines/control.py:234-256,
pipelines/configuration.py:559-566). The engine's equivalent is a
self-contained HTML summary of a ValidationResult: global profile
stats, per-partition verdict grid, and the top violations — built from
already-computed (tiny) frames, so rendering costs no extra scan of the
input table. No external templating/profiling deps (none in the
container); the markup is hand-rolled and inlines its own CSS.
"""

from __future__ import annotations

import html
from datetime import datetime, timezone

_CSS = """
body{font-family:system-ui,sans-serif;margin:2em;color:#1a1a2e}
h1{font-size:1.4em}h2{font-size:1.1em;margin-top:1.5em}
table{border-collapse:collapse;margin:0.5em 0}
td,th{border:1px solid #ccd;padding:0.25em 0.6em;font-size:0.85em;text-align:left}
th{background:#eef}tr.fail td{background:#fdd}
.kv td:first-child{font-weight:600;background:#f5f5fa}
"""


def _table(rows: list[dict], *, fail_key: str | None = None) -> str:
    if not rows:
        return "<p><em>none</em></p>"
    cols = list(rows[0].keys())
    out = ["<table><tr>"] + [f"<th>{html.escape(str(c))}</th>" for c in cols] + ["</tr>"]
    for r in rows:
        cls = ' class="fail"' if fail_key and str(r.get(fail_key)) == "fail" else ""
        out.append(f"<tr{cls}>")
        out += [f"<td>{html.escape(str(r[c]))}</td>" for c in cols]
        out.append("</tr>")
    out.append("</table>")
    return "".join(out)


def render_report(result, *, run_id: str = "adhoc", top_n: int = 25) -> str:
    """Render a ValidationResult as a standalone HTML page (string)."""
    stats = result.stats
    verdicts = [r.asDict() for r in result.verdicts.orderBy("part", "check_name").collect()]
    top = [
        r.asDict()
        for r in result.top_violations(top_n).collect()
    ]
    drift = (
        [r.asDict() for r in result.drift.collect()] if result.drift is not None else []
    )
    n_fail = sum(1 for v in verdicts if v.get("status") == "fail")
    prof_rows = [
        {"stat": k, "value": getattr(stats, k)}
        for k in (
            "n_rows", "mean_n_tok", "std_n_tok", "q1_n_tok", "median_n_tok",
            "q3_n_tok", "mad_n_tok", "min_n_tok", "max_n_tok",
        )
    ]
    ts = datetime.now(timezone.utc).isoformat(timespec="seconds")
    parts = [
        f"<!doctype html><html><head><meta charset='utf-8'><style>{_CSS}</style>",
        f"<title>validation report {html.escape(run_id)}</title></head><body>",
        f"<h1>Validation report — run <code>{html.escape(run_id)}</code></h1>",
        f"<p>generated {ts} · {len(verdicts)} verdicts · "
        f"<b>{n_fail} failed</b></p>",
        "<h2>Global profile</h2>",
        _table([{ "stat": r["stat"], "value": r["value"]} for r in prof_rows]),
        "<h2>Per-partition verdicts</h2>",
        _table(verdicts, fail_key="status"),
        f"<h2>Top violations (by severity, first {top_n})</h2>",
        _table(top),
    ]
    if drift:
        parts += ["<h2>Drift vs baseline</h2>", _table(drift)]
    if result.schema_issues:
        parts += [
            "<h2>Schema issues</h2>",
            _table([{"issue": str(i)} for i in result.schema_issues]),
        ]
    parts.append("</body></html>")
    return "".join(parts)


def write_report(result, path: str, *, run_id: str = "adhoc", top_n: int = 25) -> None:
    """Render and write the HTML report to a local/NFS path (S5 sink)."""
    with open(path, "w") as f:
        f.write(render_report(result, run_id=run_id, top_n=top_n))
