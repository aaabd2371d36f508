from brink_spark.oracle.oracle import CrawlResult, crawl_oracle  # noqa: F401
