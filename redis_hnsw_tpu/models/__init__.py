from .flat import FlatIndex
from .hnsw import HNSWIndex, SearchResult
