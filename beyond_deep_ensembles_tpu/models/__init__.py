"""Model zoo: from-scratch backbones parameterized by layer-type factories
so every dense/conv can be plain, BBB-variational, or Rank-1
(reference src/architectures/)."""
from .layers import DenseFactory, ConvFactory, make_dense, make_conv  # noqa: F401
from .mlp import RegressionMLP  # noqa: F401
from .resnet import ResNet18, ResNet20, ResNet50, PreResNet20  # noqa: F401
from .densenet import DenseNet, DenseNetClassifier  # noqa: F401
from .bert import BertClassifier, DistilBertConfig  # noqa: F401
from .tiramisu import MidasTiramisu  # noqa: F401
from .lenet import LeNet5  # noqa: F401
from .cnn_lstm import CNNLSTM, smooth_cnn_lstm  # noqa: F401
from .zoo import MLP, get_model  # noqa: F401
