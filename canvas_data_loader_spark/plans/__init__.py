"""Orchestration: import ledger + dump pipeline (reference src/main.rs)."""
