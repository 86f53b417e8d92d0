"""Job plans mirroring the reference's Prefect flows (SURVEY §3).

Each plan composes: source adapter -> operator library -> sink. They are
pure functions of (spark, inputs, paths) so tests drive them with canned
fixtures; scheduling (cron/streaming trigger) stays outside, exactly as
the reference separates deploy.py from flows/.
"""
