from .attention_fusion import (
    AdditiveMultiModalAttention,
    CrossModalTransformerFusion,
    MLDAdapterBlock,
    TorchStyleMHA,
)
from .bert import BertEncoder, bio_clinical_bert, import_hf_bert
from .clip import CXRClip
from .heads import (
    CAdapter,
    ImageProjection,
    MultiViewFusion,
    ResidualProjection,
    SharedEmbeddingAdapter,
    TextProjection,
)
from .lora import (
    fold_lora,
    init_lora,
    lora_param_count,
    lora_paths,
    make_lora_pretrain_step,
    merge_lora,
)
from .pretrained import (
    init_tower_weights,
    load_image_tower_weights,
    load_text_tower_weights,
)
from .resnet import ResNet, import_torchvision_resnet50, resnet50
from .safetensors_io import (
    load_reference_checkpoint_safetensors,
    load_state_dict,
    save_reference_checkpoint_safetensors,
    save_safetensors,
)
from .vit import ViT, import_torchvision_vit_b16, vit_b16

__all__ = [
    "AdditiveMultiModalAttention",
    "CrossModalTransformerFusion",
    "MLDAdapterBlock",
    "TorchStyleMHA",
    "BertEncoder",
    "bio_clinical_bert",
    "import_hf_bert",
    "CXRClip",
    "CAdapter",
    "ImageProjection",
    "MultiViewFusion",
    "ResidualProjection",
    "SharedEmbeddingAdapter",
    "TextProjection",
    "fold_lora",
    "init_lora",
    "lora_param_count",
    "lora_paths",
    "make_lora_pretrain_step",
    "merge_lora",
    "ResNet",
    "import_torchvision_resnet50",
    "resnet50",
    "ViT",
    "import_torchvision_vit_b16",
    "vit_b16",
    "init_tower_weights",
    "load_image_tower_weights",
    "load_text_tower_weights",
    "load_reference_checkpoint_safetensors",
    "load_state_dict",
    "save_reference_checkpoint_safetensors",
    "save_safetensors",
]
