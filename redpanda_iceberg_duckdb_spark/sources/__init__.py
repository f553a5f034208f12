"""Connector layer. Kafka and the Iceberg REST catalog are configuration
surfaces here (no broker/catalog exists in CI); the JSON file source is fully
functional and is what tests and the streaming jobs exercise. The query layer
only sees named views, so swapping file -> Kafka -> Iceberg is config."""
