"""Label-space state-machine tests (vs tfdataset.py:68-172,341-421)."""

import numpy as np

from audio_training_tpu.taxonomy import (
    get_all_birds,
    get_ebird_id,
    get_excluded_labels,
    get_label_to_ebird_map,
    get_remappings,
    load_ontology,
)
from audio_training_tpu.taxonomy.labels import (
    admit_labels_by_count,
    build_label_space,
)


def test_all_birds_loaded():
    birds = get_all_birds()
    assert len(birds) > 1000
    assert "kiwi1" in birds or "nibkiw1" in birds
    assert list(birds) == sorted(birds)


def test_ebird_map_overrides():
    m = get_label_to_ebird_map()
    assert m["norfolk-silvereye"] == "silver3"
    assert m["chicken"] == "redjun1"
    assert get_ebird_id("Norfolk Silvereye") == "silver3"
    assert get_ebird_id("not-a-bird") == "not-a-bird"


def test_ontology_relabel_extension():
    ont = load_ontology()
    # kiwi sub-species merge (birdsconfig.py:28-36)
    assert ont.relabel_map["grskiw1"] == "kiwi"
    # noise labels auto-collapse (birdsconfig.py:190-192)
    assert ont.relabel_map["rain"] == "noise"
    assert "noise" not in ont.relabel_map
    # humans collapse (birdsconfig.py:195-197)
    assert ont.relabel_map["coughing"] == "human"
    assert "bird" in ont.all_birds


def test_get_excluded_labels():
    ont = load_ontology()
    labels = ["kiwi", "morepo2", "rain", "noise", "human", "coughing",
              "unknownthing", "baicra4"]
    excluded = get_excluded_labels(ont, labels)
    # rain is noise and noise present -> kept; unknownthing excluded
    assert "unknownthing" in excluded
    assert "rain" not in excluded
    assert "kiwi" not in excluded


def test_get_remappings_generic_bird():
    ont = load_ontology()
    labels = ["bird", "kiwi", "morepo2", "noise", "rain", "whiteh1"]
    # "bird" is normally admitted by count at runtime (tfdataset.py:147-148)
    excluded = [l for l in get_excluded_labels(ont, labels) if l != "bird"]
    extra, re_dic, new_labels = get_remappings(ont, labels, excluded)
    assert "bird" in new_labels and "kiwi" in new_labels
    # trainable specific birds light up the generic bird output too
    assert extra["kiwi"] == new_labels.index("bird")
    # rain remaps to noise index
    assert re_dic["rain"] == new_labels.index("noise")
    # whiteh1 (whitehead; a bird but not in BIRD_TRAIN_LABELS) is excluded by
    # get_excluded_labels, so it drops to -1 (tfdataset.py:370-373)
    assert re_dic["whiteh1"] == -1
    # ...but with no exclusions it folds into generic bird
    _, re2, nl2 = get_remappings(ont, labels, [])
    assert re2["whiteh1"] == nl2.index("bird")


def test_get_remappings_no_generic_bird():
    ont = load_ontology()
    labels = ["bird", "kiwi", "noise"]
    extra, re_dic, new_labels = get_remappings(
        ont, labels, [], use_generic_bird=False
    )
    assert re_dic["bird"] == -1
    assert extra == {}


def test_get_remappings_merged_label():
    ont = load_ontology()
    labels = ["grskiw1", "kiwi", "noise", "bird"]
    extra, re_dic, new_labels = get_remappings(ont, labels, [])
    # grskiw1 merges into kiwi and disappears from the vocabulary
    assert "grskiw1" not in new_labels
    # Reference quirk (tfdataset.py:399-419): the generic-bird pass runs
    # *after* the merge pass and overwrites non-trainable birds — so a merged
    # sub-species ends up remapped to generic "bird", not its merge target.
    assert re_dic["grskiw1"] == new_labels.index("bird")
    # without generic-bird mode the merge target remains in force
    _, re2, nl2 = get_remappings(ont, labels, [], use_generic_bird=False)
    assert re2["grskiw1"] == nl2.index("kiwi")


def test_admit_labels_by_count():
    ont = load_ontology()
    meta = {
        "counts": {
            "train": {
                "sample_counts": {"whiteh1": 100, "tui1": 10, "skylar": 60},
                "rec_counts": {"whiteh1": 60, "tui1": 5, "skylar": 40},
            },
            "validation": {"sample_counts": {"whiteh1": 5, "tui1": 1, "skylar": 5}},
        }
    }
    new_ont, with_data = admit_labels_by_count(ont, meta)
    assert "whiteh1" in new_ont.bird_train_labels  # >50/>50/>2
    assert "skylar" not in new_ont.bird_train_labels  # only 40 recs
    assert "tui1" in new_ont.bird_train_labels  # pre-seeded in the ontology


def test_build_label_space_one_hot():
    ont = load_ontology()
    labels = ["bird", "kiwi", "morepo2", "noise", "rain", "unknownthing"]
    space = build_label_space(ont, labels)
    assert "unknownthing" in space.excluded
    kiwi_sid = space.source_labels.index("kiwi")
    y = space.one_hot([kiwi_sid])
    assert y[space.index_of("kiwi")] == 1
    assert y[space.index_of("bird")] == 1  # extra generic-bird hit
    assert y.sum() == 2
    # excluded label produces empty target
    bad_sid = space.source_labels.index("unknownthing")
    assert space.one_hot([bad_sid]).sum() == 0


def test_label_space_roundtrip():
    ont = load_ontology()
    space = build_label_space(ont, ["bird", "kiwi", "noise"])
    d = space.to_dict()
    from audio_training_tpu.taxonomy.labels import LabelSpace

    space2 = LabelSpace.from_dict(d)
    assert space2.labels == space.labels
    np.testing.assert_array_equal(space2.remap, space.remap)
