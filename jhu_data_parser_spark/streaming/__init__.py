"""Structured Streaming jobs (SURVEY.md §2.9): the incremental variant of
the reference's daily full-refresh batch (systemd timer,
systemd/jhu-data-parser.timer:5-6), plus watermarked windowed aggregation
and stateful dedup."""
