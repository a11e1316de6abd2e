"""End-user pipelines (the reference's scripts/sampling layer)."""
