"""Reference-workflow compatibility shim tests: the module-global data
pattern + TrDataset/TeDataset wrappers must drive the real trainers."""

import numpy as np


def test_compat_reference_workflow(fast_settings):
    from cvaegan_tpu import CVAEGAN, Classifier, compat

    compat.set_random_state(0)
    compat.prepare_datasets()  # blobs fixture, reference style
    assert compat.feature_num == 30 and compat.label_num == 5
    assert len(compat.tr_samples) == 900

    m = CVAEGAN()
    m.fit(compat.TrDataset())
    g = m.generate_samples(0, 8)
    assert g.shape == (8, 30)

    # reference augmentation idiom: mutate the globals, re-wrap
    compat.tr_samples = np.concatenate([compat.tr_samples, g])
    compat.tr_labels = np.concatenate(
        [compat.tr_labels, np.zeros(8, np.int32)])
    compat.set_dataset_values()
    assert len(compat.TrDataset()) == 908

    clf = Classifier("compat")
    clf.fit(compat.TrDataset())
    clf.test((compat.te_samples, compat.te_labels))
    assert set(clf.metrics) == {"Precision", "Recall", "F1"}

    compat.transfer_to_binary()
    assert set(np.unique(compat.tr_labels)) <= {0, 1}


def test_compat_test_mode(fast_settings):
    from cvaegan_tpu import compat
    from cvaegan_tpu.core import config as config_lib

    compat.turn_on_test_mode()
    assert config_lib.settings.gan.epochs == 1
    assert config_lib.settings.classifier.epochs == 1
