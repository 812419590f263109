"""External system clients: Schema Registry, Kafka admin (gated on
environment), deploy scaffolding."""
