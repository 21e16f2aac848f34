from spark_frontier.storage.snapstore import SnapStore, SnapTable

__all__ = ["SnapStore", "SnapTable"]
