"""Interactive web dashboard — entry point A of the reference
(the Streamlit app, ``Health_Jim.py:759-981``) as a dependency-free
stdlib HTTP server over the same analytics.

Parity mapping (SURVEY §3.1):

- sidebar Year/Country filters applying to every analytics section
  (``Health_Jim.py:886-892``) → the filter bar backed by ``/api/meta``
  (distinct years/countries) and the ``year``/``country`` query params
  of ``/api/dashboard``;
- the mortality trend's deliberate country-only slice of the FULL frame
  (``Health_Jim.py:940-945``) and the correlation tab's unfiltered frame
  (``Health_Jim.py:1140``) → inherited verbatim from
  :func:`..jobs.dashboard.dashboard_sections`, which this app serves;
- CSV upload (``Health_Jim.py:771-789``) → ``POST /api/upload`` with the
  raw CSV as the request body; the pipeline re-runs and the dashboard
  switches to the uploaded dataset.

Architectural difference, on purpose: the Streamlit app re-cleans the
CSV and retrains the model on every widget interaction (the script
reruns top-to-bottom, ``Health_Jim.py:894-897``); here the cleaned
frame is checkpointed ONCE per dataset and every filter change is a
Catalyst-planned slice of it, with per-(year, country) responses
memoized. Streamlit itself is not a container dependency, and a web
framework would add nothing: the app surface is two JSON endpoints and
one HTML page.

Scale note: the served frame is a localCheckpoint at dashboard
cardinality (the reference dataset is 10k rows; a 100 TB deployment
would point the same endpoints at a pre-aggregated silver table — the
queries are identical, only the input path changes).

Usage::

    python -m health_etl_pipeline_and_analytics_with_machine_learning_spark.jobs.webapp \
        <raw_csv> [--port 8099]
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.lineage import lineage_cut
from ..pipeline import clean_health_dataset
from ..session import get_spark
from .dashboard import dashboard_sections

_PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Health Analytics Dashboard</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 0; background: #fafafa; }
  header { background: #13294b; color: #fff; padding: 0.8rem 1.2rem; }
  header h1 { font-size: 1.1rem; margin: 0; }
  #filters { padding: 0.8rem 1.2rem; background: #fff; border-bottom: 1px solid #ddd; }
  select { margin-right: 1rem; padding: 0.25rem; }
  nav button { border: 0; background: none; padding: 0.6rem 0.9rem; cursor: pointer;
               border-bottom: 2px solid transparent; font-size: 0.95rem; }
  nav button.active { border-bottom-color: #13294b; font-weight: 600; }
  main { padding: 1rem 1.2rem; }
  table { border-collapse: collapse; background: #fff; }
  th, td { border: 1px solid #ddd; padding: 0.3rem 0.6rem; font-size: 0.85rem; }
  th { background: #eef2f7; text-align: left; }
  #status { color: #666; font-size: 0.85rem; }
</style>
</head>
<body>
<header><h1>Health Analytics Dashboard</h1></header>
<div id="filters">
  <label>Year <select id="year"><option value="">All</option></select></label>
  <label>Country <select id="country"><option value="">All</option></select></label>
  <span id="status"></span>
</div>
<nav id="tabs"></nav>
<main><div id="content"></div></main>
<script>
const SECTIONS = [
  ["overview", "Overview"],
  ["deadliest_diseases", "Deadliest Diseases"],
  ["mortality_trend", "Mortality Trend"],
  ["gender_impact", "Gender Impact"],
  ["treatment_cost", "Treatment Cost"],
  ["urban_rural", "Urban vs Rural"],
  ["correlation_with_mortality", "Correlation"],
];
let data = null, active = "overview";
// uploaded CSVs control the row values: escape EVERYTHING that is
// concatenated into markup, or a crafted country/disease name becomes
// stored XSS in the viewer's browser
const esc = s => String(s).replace(/[&<>"']/g,
  ch => ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;","'":"&#39;"}[ch]));
function render() {
  const el = document.getElementById("content");
  if (!data) { el.textContent = "Loading…"; return; }
  const rows = data[active] || [];
  if (!rows.length) { el.textContent = "No rows."; return; }
  const cols = Object.keys(rows[0]);
  let html = "<table><tr>" + cols.map(c => `<th>${esc(c)}</th>`).join("") + "</tr>";
  for (const r of rows)
    html += "<tr>" + cols.map(c => `<td>${esc(r[c] ?? "")}</td>`).join("") + "</tr>";
  el.innerHTML = html + "</table>";
}
function tabs() {
  const nav = document.getElementById("tabs");
  nav.innerHTML = "";
  for (const [key, label] of SECTIONS) {
    const b = document.createElement("button");
    b.textContent = label;
    b.className = key === active ? "active" : "";
    b.onclick = () => { active = key; tabs(); render(); };
    nav.appendChild(b);
  }
}
async function refresh() {
  document.getElementById("status").textContent = "loading…";
  const y = document.getElementById("year").value;
  const c = document.getElementById("country").value;
  const q = new URLSearchParams();
  if (y) q.set("year", y);
  if (c) q.set("country", c);
  data = await (await fetch("/api/dashboard?" + q)).json();
  document.getElementById("status").textContent = "";
  render();
}
async function init() {
  const meta = await (await fetch("/api/meta")).json();
  for (const y of meta.years)
    document.getElementById("year").add(new Option(y, y));
  for (const c of meta.countries)
    document.getElementById("country").add(new Option(c, c));
  document.getElementById("year").onchange = refresh;
  document.getElementById("country").onchange = refresh;
  tabs();
  await refresh();
}
init();
</script>
</body>
</html>
"""


class DashboardApp:
    """Holds the Spark session + checkpointed cleaned frame and answers
    the three routes. One lock serializes Spark work (the driver is a
    single JVM; concurrent HTTP readers just queue)."""

    def __init__(self, spark: SparkSession, raw_csv: str):
        self.spark = spark
        self._lock = threading.Lock()
        self._cache: dict[tuple[int | None, str | None], dict] = {}
        self._load(raw_csv)

    def _load(self, raw_csv: str) -> None:
        # ids of checkpoint blocks belonging to the frame being replaced —
        # freed AFTER the new frame materializes (repeated uploads must
        # not accumulate superseded checkpoint storage)
        jsc = self.spark.sparkContext._jsc
        prior_ids = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
        self.cleaned = lineage_cut(
            clean_health_dataset(self.spark, raw_csv), eager=True
        )
        live = jsc.getPersistentRDDs()
        for k in live.keySet().toArray():
            if int(k) in prior_ids:
                live.get(k).unpersist(False)
        years_countries = (
            self.cleaned.agg(
                F.sort_array(F.collect_set("Year")).alias("years"),
                F.sort_array(F.collect_set("Country")).alias("countries"),
            )
        ).first()
        self.meta = {
            "years": list(years_countries["years"]),
            "countries": list(years_countries["countries"]),
        }
        self._cache.clear()

    def upload(self, raw_csv: str) -> dict:
        with self._lock:
            self._load(raw_csv)
            return self.meta

    def dashboard(self, year: int | None, country: str | None) -> dict:
        key = (year, country)
        with self._lock:
            if key not in self._cache:
                self._cache[key] = dashboard_sections(
                    self.cleaned, year=year, country=country
                )
            return self._cache[key]


def make_server(app: DashboardApp, port: int = 0) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet test runs
            pass

        def _json(self, payload, code=200):
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/api/meta":
                self._json(app.meta)
            elif url.path == "/api/dashboard":
                q = parse_qs(url.query)
                try:
                    year = int(q["year"][0]) if q.get("year") else None
                except ValueError:
                    self._json({"error": "year must be an integer"}, code=400)
                    return
                country = q["country"][0] if q.get("country") else None
                try:
                    self._json(app.dashboard(year, country))
                except Exception as exc:  # surface, don't kill the server
                    self._json({"error": str(exc)}, code=500)
            else:
                self._json({"error": "not found"}, code=404)

        def do_POST(self):
            if urlparse(self.path).path != "/api/upload":
                self._json({"error": "not found"}, code=404)
                return
            import tempfile

            n = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(n)
            with tempfile.NamedTemporaryFile(
                suffix=".csv", delete=False, mode="wb"
            ) as f:
                f.write(raw)
            try:
                self._json(app.upload(f.name))
            except Exception as exc:
                self._json({"error": str(exc)}, code=400)
            finally:
                # the cleaned frame is checkpointed (lineage cut), so the
                # raw CSV is not needed after _load — leaking one temp
                # file per upload for the server lifetime otherwise
                import os

                try:
                    os.unlink(f.name)
                except OSError:
                    pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("raw_csv")
    ap.add_argument("--port", type=int, default=8099)
    args = ap.parse_args()

    spark = get_spark(app_name="webapp")
    server = make_server(DashboardApp(spark, args.raw_csv), port=args.port)
    host, port = server.server_address
    print(f"dashboard serving on http://{host}:{port}/")
    try:
        server.serve_forever()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
