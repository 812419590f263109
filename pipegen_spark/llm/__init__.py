"""AI pipeline generation: prompt builders, provider-agnostic clients,
fault-tolerant JSON repair (reference B22, internal/llm/service.go)."""
