from .prefetch import prefetch
from .synthetic import DictionaryLookupDataset, HeteroEdgeCountDataset
