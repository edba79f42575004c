from onset_fingerprinting_tpu.models.fcnn import FCNN, FCNNBundle
from onset_fingerprinting_tpu.models.cnn import CNN
from onset_fingerprinting_tpu.models.rnn import RNN, CNNRNN
from onset_fingerprinting_tpu.models.cccnn import CCCNN, paired_xcorr
from onset_fingerprinting_tpu.models.train import (
    TrainState,
    Trainer,
    make_optimizer,
)
from onset_fingerprinting_tpu.models.torch_import import (
    fcnn_variables_from_state_dict,
    load_reference_setup,
)
