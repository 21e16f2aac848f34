from spark_frontier.api.controller import CrawlController, serve_http

__all__ = ["CrawlController", "serve_http"]
