"""Database-build and batch tooling."""
