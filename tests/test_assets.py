"""Asset-management tests: profiles, preset libraries, activation, bundled
seeding, directory watcher (ref DeviceProfileManagerTests, EqualizerLibraryTests,
PresetActivationCoordinatorTests patterns: temp dirs + injected clocks)."""

import json
import os

import numpy as np
import pytest

from airwave_tpu.assets import bundled
from airwave_tpu.assets.activation import PresetActivationCoordinator
from airwave_tpu.assets.eq_library import EqualizerImportError, EqualizerManager
from airwave_tpu.assets.hrir_library import HRIRImportError, HRIRManager
from airwave_tpu.assets.profiles import (
    DeviceProfileManager,
    ProfileChangeKind,
)
from airwave_tpu.assets.store import JSONStore
from airwave_tpu.assets.watcher import DirectoryWatcher
from airwave_tpu.io import wav
from airwave_tpu.runtime.scheduler import ManualScheduler
from airwave_tpu.runtime.transport import OutputDeviceDescriptor


def make_clock(start=1000.0):
    state = {"now": start}

    def clock():
        state["now"] += 1.0
        return state["now"]

    return clock


# --- device profiles -------------------------------------------------------------


def test_profiles_persist_roundtrip_and_schema_versioning(tmp_path):
    store = JSONStore(str(tmp_path / "profiles.json"))
    m = DeviceProfileManager(store, clock=make_clock())
    m.set_hrir_preset_id("dev-1", "hrir-a")
    m.set_equalizer_preset_id("dev-1", "eq-b")

    m2 = DeviceProfileManager(store)
    assert m2.hrir_preset_id("dev-1") == "hrir-a"
    assert m2.equalizer_preset_id("dev-1") == "eq-b"

    # Future schema versions are ignored wholesale.
    store.save({"schemaVersion": 99, "payload": [{"device_uid": "dev-9"}]})
    m3 = DeviceProfileManager(store)
    assert m3.profile("dev-9") is None


def test_profiles_dedup_keeps_latest_last_seen(tmp_path):
    store = JSONStore(str(tmp_path / "profiles.json"))
    store.save({"schemaVersion": 1, "payload": [
        {"device_uid": "d", "hrir_preset_id": "old", "last_seen_at": 1.0},
        {"device_uid": "d", "hrir_preset_id": "new", "last_seen_at": 2.0},
    ]})
    m = DeviceProfileManager(store)
    assert m.hrir_preset_id("d") == "new"


def test_profiles_targets_merged_view_and_change_revisions(tmp_path):
    store = JSONStore(str(tmp_path / "profiles.json"))
    m = DeviceProfileManager(store, clock=make_clock())
    changes = []
    m.observe(changes.append)

    m.set_hrir_preset_id("remembered-dev", "h1")
    m.update_available_devices([
        OutputDeviceDescriptor(uid="live-dev", name="Speakers"),
        OutputDeviceDescriptor(uid="virtual", name="X", is_virtual=True),
    ])
    rows = m.targets()
    assert [(r.device_uid, r.is_available) for r in rows] == [
        ("live-dev", True), ("remembered-dev", False),
    ]
    # Observation alone does NOT materialize a profile (ref: an available
    # unsaved target is selectable without persistence).
    assert rows[0].profile is None
    assert m.profile("live-dev") is None
    # Nil selection for the unsaved target: zero-write no-op.
    before = len(changes)
    m.set_hrir_preset_id("live-dev", None)
    assert m.profile("live-dev") is None and len(changes) == before
    revisions = [c.revision for c in changes]
    assert revisions == sorted(revisions) and len(set(revisions)) == len(revisions)
    assert changes[0].kind == ProfileChangeKind.HRIR

    # First real selection materializes the profile with live metadata.
    m.set_hrir_preset_id("live-dev", "h2")
    assert m.profile("live-dev").name == "Speakers"
    m.forget_device("remembered-dev")
    assert m.profile("remembered-dev") is None
    m.reset_profile("live-dev")
    assert m.profile("live-dev").hrir_preset_id is None
    # A forgotten device re-observed stays transient.
    m.forget_device("live-dev")
    m.update_available_devices([
        OutputDeviceDescriptor(uid="live-dev", name="Speakers"),
    ])
    assert m.profile("live-dev") is None


def test_profiles_persist_last_seen_refreshes_debounced(tmp_path):
    """Pure last_seen_at refreshes reach disk (debounced): the load-time
    duplicate dedup keys on the persisted timestamp, so it must track
    reality instead of waiting for an unrelated metadata write."""
    t = [1000.0]
    store = JSONStore(str(tmp_path / "profiles.json"))
    m = DeviceProfileManager(store, clock=lambda: t[0])
    m.set_hrir_preset_id("dev", "h1")
    dev = OutputDeviceDescriptor(uid="dev", name="Speakers")
    m.update_available_devices([dev])

    def on_disk():
        fresh = DeviceProfileManager(JSONStore(store.path),
                                     clock=lambda: t[0])
        return fresh.profile("dev").last_seen_at

    first = on_disk()
    # Within the debounce window: refreshed in memory, not on disk.
    t[0] += 10.0
    m.update_available_devices([dev])
    assert m.profile("dev").last_seen_at == t[0]
    assert on_disk() == first
    # Past the window: the pure timestamp refresh is persisted, and it is
    # a save only — no observer change is emitted for it.
    changes = []
    m.observe(changes.append)
    t[0] += DeviceProfileManager.SEEN_PERSIST_INTERVAL
    m.update_available_devices([dev])
    assert on_disk() == t[0]
    assert changes == []
    # FREQUENT polls (every few seconds, the realistic device-list cadence)
    # must still persist once per window: the debounce keys on the last
    # PERSISTED value, not the in-memory one each poll refreshes.
    last_disk = on_disk()
    for _ in range(int(DeviceProfileManager.SEEN_PERSIST_INTERVAL / 5) + 2):
        t[0] += 5.0
        m.update_available_devices([dev])
    assert on_disk() > last_disk, (
        "frequent refreshes never reached disk — inverted debounce"
    )


def test_profiles_clear_dangling(tmp_path):
    m = DeviceProfileManager(JSONStore(str(tmp_path / "p.json")),
                             clock=make_clock())
    m.set_hrir_preset_id("d1", "gone")
    m.set_equalizer_preset_id("d1", "kept")
    affected = m.clear_dangling_preset_ids(valid_hrir_ids={"other"},
                                           valid_equalizer_ids={"kept"})
    assert affected == ["d1"]
    assert m.hrir_preset_id("d1") is None
    assert m.equalizer_preset_id("d1") == "kept"


# --- equalizer library -----------------------------------------------------------------


def write_preset(path, text="Preamp: -3 dB\nFilter 1: ON PK Fc 100 Hz Gain 2 dB Q 1\n"):
    with open(path, "w") as f:
        f.write(text)
    return str(path)


def test_eq_import_list_load_delete(tmp_path):
    m = EqualizerManager(str(tmp_path / "eq"), clock=make_clock())
    src = write_preset(tmp_path / "My Preset.txt")
    preset = m.import_preset(src)
    assert m.presets()[0].display_name == "My Preset"
    definition = m.load_definition(preset.id)
    assert definition.preamp_db == -3

    # Collision: second import gets a unique filename.
    preset2 = m.import_preset(src)
    assert preset2.filename != preset.filename

    m.delete_preset(preset.id)
    assert m.preset(preset.id) is None
    assert not os.path.exists(os.path.join(m.directory, preset.filename))
    # Reload from disk keeps the survivor.
    m2 = EqualizerManager(m.directory)
    assert {p.id for p in m2.presets()} == {preset2.id}


def test_eq_import_validation(tmp_path):
    m = EqualizerManager(str(tmp_path / "eq"))
    bad_ext = tmp_path / "p.cfg"
    bad_ext.write_text("Preamp: -1 dB\n")
    with pytest.raises(EqualizerImportError):
        m.import_preset(str(bad_ext))

    too_big = tmp_path / "big.txt"
    too_big.write_bytes(b"#" + b"x" * 1_100_000)
    with pytest.raises(EqualizerImportError):
        m.import_preset(str(too_big))

    invalid = write_preset(tmp_path / "bad.txt", "garbage directive\n")
    from airwave_tpu.utils.errors import EqualizerParseError
    with pytest.raises(EqualizerParseError):
        m.import_preset(invalid)

    good = write_preset(tmp_path / "good.txt")
    link = tmp_path / "link.txt"
    os.symlink(good, link)
    with pytest.raises(EqualizerImportError):
        m.import_preset(str(link))


def test_eq_import_rolls_back_on_manifest_failure(tmp_path, monkeypatch):
    m = EqualizerManager(str(tmp_path / "eq"), clock=make_clock())
    src = write_preset(tmp_path / "p.txt")

    def boom():
        raise OSError("disk full")

    monkeypatch.setattr(m, "_save_manifest", boom)
    with pytest.raises(OSError):
        m.import_preset(src)
    # File rolled back out; library empty.
    leftovers = [f for f in os.listdir(m.directory) if f.endswith(".txt")]
    assert leftovers == []
    assert m.presets() == []


def test_eq_delete_restores_on_manifest_failure(tmp_path, monkeypatch):
    m = EqualizerManager(str(tmp_path / "eq"), clock=make_clock())
    preset = m.import_preset(write_preset(tmp_path / "p.txt"))

    def boom():
        raise OSError("disk full")

    monkeypatch.setattr(m, "_save_manifest", boom)
    with pytest.raises(OSError):
        m.delete_preset(preset.id)
    assert m.preset(preset.id) is not None
    assert os.path.exists(os.path.join(m.directory, preset.filename))


# --- activation coordinator -----------------------------------------------------------


def test_activation_latest_wins_and_stale_dropped():
    c = PresetActivationCoordinator()
    resolved = []
    pending = {}

    def slow_work(key, token, done):
        pending[key] = (token, done)

    c.request("a", slow_work, lambda r: resolved.append(("a", r)))
    c.request("b", slow_work, lambda r: resolved.append(("b", r)))
    assert pending["a"][0].cancelled  # newest wins
    pending["a"][1]("result-a")  # stale completion dropped
    assert resolved == []
    pending["b"][1]("result-b")
    assert resolved == [("b", "result-b")]


def test_activation_coalesces_duplicate_keys():
    c = PresetActivationCoordinator()
    resolved = []
    pending = {}

    def slow_work(key, token, done):
        pending[key] = done

    c.request("k", slow_work, lambda r: resolved.append(1))
    c.request("k", slow_work, lambda r: resolved.append(2))
    assert len(pending) == 1
    pending["k"]("r")
    assert resolved == [1, 2]


def test_activation_raising_work_does_not_wedge_the_key():
    """Regression: work that escapes without calling done() used to leave
    the in-flight entry set forever — every later same-key request
    coalesced behind a completion that could never fire. The dispatch
    wrapper must clear the jam (and still propagate the error)."""
    c = PresetActivationCoordinator()
    resolved = []

    def broken_work(key, token, done):
        raise RuntimeError("exploded before done()")

    with pytest.raises(RuntimeError):
        c.request("k", broken_work, lambda r: resolved.append(("dead", r)))
    assert resolved == []

    done_box = {}

    def good_work(key, token, done):
        done_box["done"] = done

    # The key must accept fresh work, and only ITS completion fires.
    c.request("k", good_work, lambda r: resolved.append(("ok", r)))
    assert "done" in done_box
    done_box["done"]("r")
    assert resolved == [("ok", "r")]


# --- HRIR library -----------------------------------------------------------------------


def make_hrir_file(path, channels=14, frames=256, rate=48_000):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((channels, frames)) * 0.1).astype(np.float32)
    wav.save(str(path), audio, rate)
    return str(path)


def test_hrir_import_never_rebinds_a_vanished_presets_filename(tmp_path):
    """A metadata row whose WAV was deleted externally (no reload yet)
    keeps its filename reserved: a new import with the same basename must
    pick a fresh name, not write into the dangling row's slot (which would
    resurrect the old preset over the new file and cross-wire deletion)."""
    m = HRIRManager(str(tmp_path / "hrir"), clock=make_clock())
    a = m.import_preset(make_hrir_file(tmp_path / "Set.wav"))
    os.unlink(os.path.join(m.directory, a.filename))  # external deletion
    (tmp_path / "src").mkdir()
    b = m.import_preset(make_hrir_file(tmp_path / "src" / "Set.wav"))
    assert b.filename != a.filename
    m.delete_preset(a.id)  # must not unlink b's file
    assert os.path.exists(os.path.join(m.directory, b.filename))
    m.reload()
    assert {p.id for p in m.presets()} == {b.id}


def test_hrir_import_activate_publish_deactivate(tmp_path):
    m = HRIRManager(str(tmp_path / "hrir"), clock=make_clock())
    preset = m.import_preset(make_hrir_file(tmp_path / "Set A.wav"))
    assert preset.channel_count == 14 and preset.frame_count == 256

    published = []
    m.observe_renderer(published.append)
    errors = []
    m.activate_preset(preset.id, 48_000.0, completion=errors.append)
    assert errors == [None]
    assert m.published_renderer is not None
    assert m.published_renderer.num_speakers == 2
    assert m.active_preset_id == preset.id

    m.deactivate()
    assert m.published_renderer is None
    assert published[-1] is None


def test_hrir_import_preflight(tmp_path):
    m = HRIRManager(str(tmp_path / "hrir"))
    not_wav = tmp_path / "x.wav"
    not_wav.write_bytes(b"junk")
    with pytest.raises(HRIRImportError):
        m.import_preset(str(not_wav))
    mono = tmp_path / "mono.wav"
    wav.save(str(mono), np.ones((1, 64), np.float32), 48_000)
    with pytest.raises(HRIRImportError):
        m.import_preset(str(mono))


def test_hrir_delete_active_preset_deactivates(tmp_path):
    m = HRIRManager(str(tmp_path / "hrir"), clock=make_clock())
    preset = m.import_preset(make_hrir_file(tmp_path / "a.wav"))
    m.activate_preset(preset.id, 48_000.0)
    assert m.published_renderer is not None
    m.delete_preset(preset.id)
    assert m.published_renderer is None
    assert m.preset(preset.id) is None


def test_hrir_7_channel_uses_symmetric_map(tmp_path):
    m = HRIRManager(str(tmp_path / "hrir"), clock=make_clock())
    preset = m.import_preset(make_hrir_file(tmp_path / "seven.wav", channels=7))
    m.activate_preset(preset.id, 48_000.0)
    assert m.published_renderer is not None  # hesuvi7 map resolved FL/FR


# --- bundled seeding -----------------------------------------------------------------------


def test_bundled_seed_idempotent_and_deletions_stick(tmp_path):
    eq = EqualizerManager(str(tmp_path / "eq"), clock=make_clock())
    hrir = HRIRManager(str(tmp_path / "hrir"), clock=make_clock())
    staging = str(tmp_path / "staging")

    bundled.seed_bundled_presets(eq, hrir, staging)
    assert len(eq.presets()) == 5
    assert len(hrir.presets()) == 3
    assert all(p.is_bundled for p in eq.presets())

    # Delete one of each; reseeding must NOT resurrect them.
    eq.delete_preset(eq.presets()[0].id)
    hrir.delete_preset(hrir.presets()[0].id)
    bundled.seed_bundled_presets(eq, hrir, staging)
    assert len(eq.presets()) == 4
    assert len(hrir.presets()) == 2


def test_synthetic_hrir_properties():
    bank = bundled.synthesize_hrir("neutral", length=2048)
    assert bank.shape == (14, 2048)
    assert abs(float(np.max(np.abs(bank))) - 0.9) < 1e-3
    # FL direct (ch0) leads FL cross (ch1): left-side source hits the left
    # ear earlier and louder.
    fl_left, fl_right = bank[0], bank[1]
    assert np.argmax(np.abs(fl_left)) < np.argmax(np.abs(fl_right))
    assert np.max(np.abs(fl_left)) > np.max(np.abs(fl_right))
    # Center channels are symmetric in arrival time.
    assert abs(int(np.argmax(np.abs(bank[6]))) - int(np.argmax(np.abs(bank[13])))) <= 1
    # Physical ITD ordering: rear (135 deg) never exceeds side (90 deg) —
    # Woodworth mirrored beyond its 90-degree domain. Peak-lag ITD via
    # cross-correlation of the direct/cross pair per direction.
    def peak_itd(direct, cross):
        xc = np.correlate(np.abs(direct), np.abs(cross), "full")
        return abs(int(np.argmax(xc)) - (len(direct) - 1))
    itd_side = peak_itd(bank[2], bank[3])    # SL at 90
    itd_back = peak_itd(bank[4], bank[5])    # BL at 135
    itd_front = peak_itd(bank[0], bank[1])   # FL at 30
    assert itd_back <= itd_side
    assert itd_front < itd_side
    # Room/Stage have progressively more tail energy.
    room = bundled.synthesize_hrir("room", length=2048)
    stage = bundled.synthesize_hrir("stage", length=2048)
    def tail_energy(b):
        return float(np.sum(b[:, 1024:] ** 2))
    assert tail_energy(room) > tail_energy(bank)
    assert tail_energy(stage) > tail_energy(room)


# --- watcher ---------------------------------------------------------------------------------


def test_directory_watcher_debounces(tmp_path):
    sched = ManualScheduler()
    fired = []
    watcher = DirectoryWatcher(str(tmp_path), lambda: fired.append(sched.now),
                               sched, poll_interval=0.5, debounce=0.2)
    watcher.start()
    sched.advance(0.5)  # poll: no change
    assert fired == []
    (tmp_path / "new.txt").write_text("x")
    sched.advance(0.5)  # poll sees change -> debounce scheduled
    assert fired == []
    (tmp_path / "new2.txt").write_text("y")
    sched.advance(0.15)  # second poll at 1.5 restarts debounce
    sched.advance(0.4)
    assert len(fired) == 1
    watcher.stop()
    (tmp_path / "new3.txt").write_text("z")
    sched.advance(2.0)
    assert len(fired) == 1


def test_hrir_coalesced_duplicate_activations_both_complete(tmp_path):
    """Two concurrent activations of the SAME (preset, rate, layout) share
    one renderer build AND both callers' completions fire — the staleness
    guard drops only different-key supersessions and deactivations, not
    coalesced duplicates."""
    deferred = []
    m = HRIRManager(str(tmp_path / "hrir"), clock=make_clock(),
                    run_async=deferred.append)
    preset = m.import_preset(make_hrir_file(tmp_path / "Set.wav"))
    done = []
    m.activate_preset(preset.id, 48_000.0,
                      completion=lambda e: done.append(("first", e)))
    m.activate_preset(preset.id, 48_000.0,
                      completion=lambda e: done.append(("second", e)))
    assert len(deferred) == 1  # coalesced into one renderer build
    deferred[0]()
    assert done == [("first", None), ("second", None)]
    assert m.published_renderer is not None

    # A different-rate supersession still drops the stale completion.
    done.clear()
    deferred.clear()
    m.activate_preset(preset.id, 48_000.0,
                      completion=lambda e: done.append(("old", e)))
    m.activate_preset(preset.id, 44_100.0,
                      completion=lambda e: done.append(("new", e)))
    for fn in deferred:
        fn()
    assert ("old", None) not in done and ("new", None) in done


def test_manifest_corruption_and_traversal_rows_are_skipped(tmp_path):
    """A corrupt or hostile manifest row (path-traversal filename, garbage
    field types, missing managed file) skips that row — it never crashes
    library construction or resolves outside the managed directory (ref
    EqualizerLibraryTests traversal/corrupt-manifest cases)."""
    import json
    import os

    m = EqualizerManager(str(tmp_path / "eq"), clock=make_clock())
    good = m.import_preset(write_preset(tmp_path / "good.txt"))

    # Hand-corrupt the manifest: traversal row + garbage types + missing file.
    outside = tmp_path / "outside.txt"
    outside.write_text("Preamp: -1 dB\n")
    manifest_path = os.path.join(m.directory, "manifest.json")
    with open(manifest_path) as fh:
        data = json.load(fh)
    data["presets"]["evil"] = {
        "display_name": "evil",
        "filename": os.path.join("..", "outside.txt"),
        "imported_at": 1.0,
    }
    data["presets"]["garbage"] = {
        "display_name": "g",
        "filename": good.filename,
        "imported_at": "not-a-number",
    }
    data["presets"]["gone"] = {
        "display_name": "gone", "filename": "missing.txt",
        "imported_at": 2.0,
    }
    with open(manifest_path, "w") as fh:
        json.dump(data, fh)

    m.reload()
    ids = m.preset_ids()
    assert "evil" not in ids and "gone" not in ids
    assert good.id in ids
    assert "garbage" in ids  # corrupt field tolerated, row kept
    assert m.preset("garbage").imported_at == 0.0

    # Fully corrupt manifest JSON: empty library, no crash.
    with open(manifest_path, "w") as fh:
        fh.write("{ not json")
    m.reload()
    assert m.presets() == []


def test_inventory_filters_duplicate_uids(tmp_path):
    """The manager boundary filters duplicate UIDs (ref
    OutputDeviceDiscoveryCoordinatorTests) — one target row per device."""
    store = JSONStore(str(tmp_path / "profiles.json"))
    m = DeviceProfileManager(store, clock=make_clock())
    m.update_available_devices([
        OutputDeviceDescriptor(uid="dup", name="First"),
        OutputDeviceDescriptor(uid="dup", name="Second"),
        OutputDeviceDescriptor(uid="other", name="Other"),
    ])
    rows = [t for t in m.targets() if t.is_available]
    assert [(t.device_uid, t.name) for t in rows] == [
        ("dup", "First"), ("other", "Other"),
    ]
