"""Observability: listener-driven metrics, rule-based validation, reports.

Replaces the reference's HTTP polling stack (Flink REST /jobs + Kafka
metadata polls + consumer-lag fallback, internal/pipeline/runner.go:925-1108,
internal/dashboard/metrics.go) with in-process StreamingQueryListener events
— no boundary, no placeholder metrics.
"""
