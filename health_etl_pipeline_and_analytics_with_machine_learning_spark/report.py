"""Driver-side report sinks — the reference's weekly-report artifacts
(nb@28: PDF + XLSX + email) rebuilt over collected query results.

All inputs are ≤ 50-row DataFrames by construction (SURVEY §2.1), so
collecting to the driver is correct at any scale — the engine does the
heavy lifting, the report renders aggregates.

reportlab / openpyxl / smtplib paths are gated: the PDF/XLSX writers
degrade to JSON when the libraries are absent (this container ships
neither), and email NEVER has inline credentials — config comes from the
caller (the reference app does this right via st.secrets,
Health_Jim.py:94-99; the notebook's hard-coded SMTP password at
nb@28:36-40 is explicitly NOT reproduced)."""

from __future__ import annotations

import json
from dataclasses import dataclass
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame


@dataclass
class ReportSection:
    title: str
    rows: list[dict]


def collect_section(title: str, df: DataFrame, limit: int = 50) -> ReportSection:
    """Materialize one (small) query result for the report."""
    return ReportSection(title=title, rows=[r.asDict() for r in df.limit(limit).collect()])


def build_report(sections: list[ReportSection], generated_at: str | None = None) -> dict:
    return {
        "title": "Health Weekly Report",
        "generated_at": generated_at
        or datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%SZ"),
        "sections": [{"title": s.title, "rows": s.rows} for s in sections],
    }


def write_json(report: dict, path: str) -> str:
    Path(path).write_text(json.dumps(report, indent=2, default=str))
    return path


def write_xlsx(report: dict, path: str) -> str:
    """XLSX sink (nb@28:212-238): one sheet per section. Falls back to
    JSON next to the requested path when openpyxl is unavailable."""
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        return write_json(report, str(Path(path).with_suffix(".json")))
    from openpyxl import Workbook

    wb = Workbook()
    wb.remove(wb.active)
    for sec in report["sections"]:
        ws = wb.create_sheet(title=sec["title"][:31])
        if sec["rows"]:
            headers = list(sec["rows"][0].keys())
            ws.append(headers)
            for row in sec["rows"]:
                ws.append([row.get(h) for h in headers])
    wb.save(path)
    return path


def write_pdf(report: dict, path: str) -> str:
    """PDF sink (Health_Jim.py:1040-1136, nb@28:134-179): title + metric
    tables. Falls back to JSON when reportlab is unavailable."""
    try:
        import reportlab  # noqa: F401
    except ImportError:
        return write_json(report, str(Path(path).with_suffix(".json")))
    from reportlab.lib.pagesizes import A4
    from reportlab.platypus import Paragraph, SimpleDocTemplate, Spacer, Table
    from reportlab.lib.styles import getSampleStyleSheet

    styles = getSampleStyleSheet()
    story = [Paragraph(report["title"], styles["Title"]), Spacer(1, 12)]
    for sec in report["sections"]:
        story.append(Paragraph(sec["title"], styles["Heading2"]))
        if sec["rows"]:
            headers = list(sec["rows"][0].keys())
            data = [headers] + [[str(r.get(h)) for h in headers] for r in sec["rows"]]
            story.append(Table(data))
        story.append(Spacer(1, 12))
    SimpleDocTemplate(path, pagesize=A4).build(story)
    return path


def send_email(
    report_path: str,
    smtp_host: str,
    smtp_port: int,
    sender: str,
    password: str,
    recipient: str,
    subject: str | None = None,
) -> None:
    """SMTP/STARTTLS with attachment (Health_Jim.py:1180-1226). ALL
    credentials come from the caller's config — never hard-coded."""
    import smtplib
    from email.message import EmailMessage

    msg = EmailMessage()
    msg["Subject"] = subject or f"Health Weekly Report {datetime.now(timezone.utc):%Y-%m-%d}"
    msg["From"] = sender
    msg["To"] = recipient
    msg.set_content("Attached: automated health analytics report.")
    data = Path(report_path).read_bytes()
    msg.add_attachment(
        data, maintype="application", subtype="octet-stream", filename=Path(report_path).name
    )
    with smtplib.SMTP(smtp_host, smtp_port) as s:
        s.starttls()
        s.login(sender, password)
        s.send_message(msg)
