from brink_spark.sources.sitegen import SiteFixture, generate_site  # noqa: F401
