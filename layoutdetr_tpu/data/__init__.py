from layoutdetr_tpu.data.tokenizer import LayoutTokenizer  # noqa: F401
from layoutdetr_tpu.data.dataset import LayoutDataset, InfiniteSampler  # noqa: F401
