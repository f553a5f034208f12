"""Iceberg catalog configuration — reference parity for SURVEY.md section 2.1
S4/S5 (/root/reference/duckdb/init.sql:11-32, setup_polaris_catalog.sh).

The iceberg-spark runtime jar is not in this image, so these builders emit the
exact spark-conf keys a deployment sets; is_available() gates any attempt to
actually use the catalog. All query code reads named views, so running against
real Iceberg tables is purely additive configuration.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ICEBERG_EXTENSION = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def rest_catalog_conf(name: str, *, uri: str, warehouse: str,
                      credential: str, oauth2_server_uri: str | None = None,
                      ) -> dict[str, str]:
    """REST (Polaris-style) catalog: mirrors the reference's ATTACH with an
    OAuth2 ICEBERG secret (init.sql:22-32)."""
    conf = {
        "spark.sql.extensions": ICEBERG_EXTENSION,
        f"spark.sql.catalog.{name}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{name}.type": "rest",
        f"spark.sql.catalog.{name}.uri": uri,
        f"spark.sql.catalog.{name}.warehouse": warehouse,
        f"spark.sql.catalog.{name}.credential": credential,
    }
    if oauth2_server_uri:
        conf[f"spark.sql.catalog.{name}.oauth2-server-uri"] = oauth2_server_uri
    return conf


def hadoop_catalog_conf(name: str, warehouse_path: str) -> dict[str, str]:
    """Filesystem catalog for local/test deployments."""
    return {
        "spark.sql.extensions": ICEBERG_EXTENSION,
        f"spark.sql.catalog.{name}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{name}.type": "hadoop",
        f"spark.sql.catalog.{name}.warehouse": warehouse_path,
    }


def s3_conf(*, endpoint: str, access_key: str, secret_key: str,
            path_style: bool = True, ssl: bool = False) -> dict[str, str]:
    """S3A options mirroring the reference's MinIO httpfs config
    (init.sql:11-16): path-style, no SSL, explicit keys."""
    return {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": str(path_style).lower(),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": str(ssl).lower(),
    }


def is_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False
