"""Source adapters: rate-limited paginated REST -> DataFrame, plus the
payload-shape normalizers that turn heterogeneous feed JSON into the
unified domain schemas (SURVEY §2.1, §2.3)."""
