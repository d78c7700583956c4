"""Shared test harnesses (not collected as tests)."""
