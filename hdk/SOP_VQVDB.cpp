// vqvdb_tpu HDK client SOPs: vqvdb::encoder / vqvdb::decoder.
//
// Thin clients of the `vqvdb` CLI over a temp-file geometry bridge — see
// hdk/README.md for the design rationale. Parameter surface mirrors the
// reference plugin (ref: /root/reference/src/SOP/SOP_VQVDB_Encoder.cpp:16-45,
// SOP_VQVDB_Decoder.cpp:17-41) plus this framework's model/residual knobs.
//
// Single translation unit over the stock HDK, SOP_NodeVerb cook pattern.

#include <GU/GU_Detail.h>
#include <OP/OP_OperatorTable.h>
#include <PRM/PRM_TemplateBuilder.h>
#include <SOP/SOP_Node.h>
#include <SOP/SOP_NodeVerb.h>
#include <UT/UT_DSOVersion.h>
#include <UT/UT_Exit.h>
#include <UT/UT_StringHolder.h>
#include <UT/UT_TempFileManager.h>

#include <array>
#include <cstdio>
#include <string>

namespace vqvdb_client {

// ---------------------------------------------------------------------------
// Subprocess bridge: run the vqvdb CLI, capture combined output for node
// error messages. popen keeps this portable across the platforms Houdini
// ships on without pulling in hboost.
// ---------------------------------------------------------------------------
struct CliResult {
    int status = -1;
    std::string output;
};

inline CliResult runCli(const std::string& command) {
    CliResult r;
#ifdef _WIN32
    FILE* pipe = _popen((command + " 2>&1").c_str(), "r");
#else
    FILE* pipe = popen((command + " 2>&1").c_str(), "r");
#endif
    if (!pipe) return r;
    std::array<char, 4096> buf;
    while (fgets(buf.data(), static_cast<int>(buf.size()), pipe))
        r.output += buf.data();
#ifdef _WIN32
    r.status = _pclose(pipe);
#else
    r.status = pclose(pipe);
#endif
    return r;
}

// Shell-safe quoting for the popen command line. Parameter values come
// from the .hip file, which may be untrusted — they must never reach the
// shell unescaped. POSIX: single quotes disable every expansion (command
// substitution, $VAR, backticks); an embedded ' becomes '\''. Windows cmd
// has no escape that is safe inside double quotes, so metacharacters are
// stripped there.
inline std::string quoted(const UT_StringHolder& s) {
#ifdef _WIN32
    std::string out = "\"";
    for (const char c : s.toStdString()) {
        switch (c) {
            case '"': case '%': case '^': case '&': case '|':
            case '<': case '>': case '\n': case '\r':
                break;  // cmd.exe expands these even inside quotes
            default:
                out += c;
        }
    }
    return out + "\"";
#else
    std::string out = "'";
    for (const char c : s.toStdString()) {
        if (c == '\'')
            out += "'\\''";
        else
            out += c;
    }
    return out + "'";
#endif
}

// Scratch .vdb path for the geometry bridge. The temp manager registers
// the base name, but the file actually written is base + ".vdb" — each
// cook deletes it explicitly (ScopedFile) so multi-GB bridge files never
// accumulate across cooks.
inline UT_StringHolder tempVdbPath(const char* tag) {
    UT_StringHolder path =
        UT_TempFileManager::class_createTempFileName(tag);
    return UT_StringHolder(path.toStdString() + ".vdb");
}

struct ScopedFile {
    std::string path;
    explicit ScopedFile(const UT_StringHolder& p) : path(p.toStdString()) {}
    ~ScopedFile() { if (!path.empty()) std::remove(path.c_str()); }
};

// ---------------------------------------------------------------------------
// Encoder
// ---------------------------------------------------------------------------
static const char* const kEncoderDs = R"THEDS(
{
    name "vqvdb_encoder"
    label "VQVDB Encoder (TPU)"
    parm { name "vdbname"   label "VDB Grid Name"          type string  default { "density" } }
    parm { name "outputpath" label "Output File (.vqvdb)"  type file    default { "" } }
    parm { name "batchsize" label "Device Batch Size"      type integer default { 4096 } range { 1 16384 } }
    parm { name "residual"  label "Near-Lossless Residual" type ordinal default { "0" }
           menu { "0" "Off"  "1" "Int8"  "2" "Half" } }
    parm { name "model"     label "Model Artifact (.vqmodel)" type file default { "" } }
    parm { name "vqvdbcmd"  label "vqvdb Executable"       type string  default { "vqvdb" } }
    parm { name "execute"   label "Encode and Save to Disk" type toggle default { "0" } }
}
)THEDS";

class EncoderVerb final : public SOP_NodeVerb {
public:
    SOP_NodeParms* allocParms() const override { return new SOP_NodeParms; }
    UT_StringHolder name() const override { return "vqvdb_encoder"; }
    CookMode cookMode(const SOP_NodeParms*) const override
    { return COOK_DUPLICATE; }

    void cook(const CookParms& cook) const override {
        SOP_Node* node = cook.getNode()
            ? CAST_SOPNODE(cook.getNode()) : nullptr;
        if (!node || !node->evalInt("execute", 0, 0.0f))
            return;
        node->setInt("execute", 0, 0.0f, 0);  // auto-reset the trigger

        UT_StringHolder out, grid, model, cmd;
        node->evalString(out, "outputpath", 0, 0.0f);
        node->evalString(grid, "vdbname", 0, 0.0f);
        node->evalString(model, "model", 0, 0.0f);
        node->evalString(cmd, "vqvdbcmd", 0, 0.0f);
        const int batch = static_cast<int>(node->evalInt("batchsize", 0, 0.0f));
        const int residual = static_cast<int>(node->evalInt("residual", 0, 0.0f));
        if (!out.isstring()) {
            cook.sopAddError(SOP_MESSAGE, "Output path must be specified.");
            return;
        }
        const GU_Detail* gdp = cook.inputGeo(0);
        if (!gdp) {
            cook.sopAddError(SOP_MESSAGE, "No input geometry connected.");
            return;
        }

        // Bridge out: Houdini's own .vdb writer (blosc/half handled by the
        // Python side without OpenVDB).
        const UT_StringHolder bridge = tempVdbPath("vqvdb_enc");
        const ScopedFile cleanup(bridge);
        if (!gdp->save(bridge.c_str(), nullptr).success()) {
            cook.sopAddError(SOP_MESSAGE, "Failed to stage input VDB grids.");
            return;
        }

        std::string c = quoted(cmd) + " encode " + quoted(bridge) + " "
            + quoted(out) + " --batch-size " + std::to_string(batch);
        if (grid.isstring()) c += " --grid " + quoted(grid);
        if (model.isstring()) c += " --model " + quoted(model);
        if (residual == 1) c += " --residual int8";
        if (residual == 2) c += " --residual f16";

        const CliResult r = runCli(c);
        if (r.status != 0) {
            cook.sopAddError(SOP_MESSAGE,
                             ("vqvdb encode failed: " + r.output).c_str());
            return;
        }
        cook.sopAddMessage(SOP_MESSAGE,
                           ("Saved " + out.toStdString()).c_str());
    }
};

static SOP_NodeVerb::Register<EncoderVerb> theEncoderVerb;

class Encoder final : public SOP_Node {
public:
    static OP_Node* make(OP_Network* net, const char* name, OP_Operator* op)
    { return new Encoder(net, name, op); }

    static PRM_Template* templates() {
        static PRM_TemplateBuilder b("SOP_VQVDB.cpp(encoder)", kEncoderDs);
        return b.templates();
    }

    const char* inputLabel(unsigned) const override { return "VDB Grids"; }

protected:
    Encoder(OP_Network* net, const char* name, OP_Operator* op)
        : SOP_Node(net, name, op) {}
    OP_ERROR cookMySop(OP_Context& ctx) override
    { return cookMyselfAsVerb(ctx); }
    const SOP_NodeVerb* cookVerb() const override
    { return theEncoderVerb.get(); }
};

// ---------------------------------------------------------------------------
// Decoder (generator node: produces grids from a .vqvdb file)
// ---------------------------------------------------------------------------
static const char* const kDecoderDs = R"THEDS(
{
    name "vqvdb_decoder"
    label "VQVDB Decoder (TPU)"
    parm { name "vdbname"   label "VDB Grid Name"         type string  default { "" } }
    parm { name "inputfile" label "Input File (.vqvdb)"   type file    default { "" } }
    parm { name "batchsize" label "Device Batch Size"     type integer default { 4096 } range { 1 16384 } }
    parm { name "model"     label "Model Artifact (.vqmodel)" type file default { "" } }
    parm { name "vqvdbcmd"  label "vqvdb Executable"      type string  default { "vqvdb" } }
}
)THEDS";

class DecoderVerb final : public SOP_NodeVerb {
public:
    SOP_NodeParms* allocParms() const override { return new SOP_NodeParms; }
    UT_StringHolder name() const override { return "vqvdb_decoder"; }
    CookMode cookMode(const SOP_NodeParms*) const override
    { return COOK_GENERATOR; }

    void cook(const CookParms& cook) const override {
        SOP_Node* node = cook.getNode()
            ? CAST_SOPNODE(cook.getNode()) : nullptr;
        if (!node) return;
        UT_StringHolder in, grid, model, cmd;
        node->evalString(in, "inputfile", 0, 0.0f);
        node->evalString(grid, "vdbname", 0, 0.0f);
        node->evalString(model, "model", 0, 0.0f);
        node->evalString(cmd, "vqvdbcmd", 0, 0.0f);
        const int batch = static_cast<int>(node->evalInt("batchsize", 0, 0.0f));
        if (!in.isstring()) {
            cook.sopAddError(SOP_MESSAGE, "Input .vqvdb must be specified.");
            return;
        }

        const UT_StringHolder bridge = tempVdbPath("vqvdb_dec");
        const ScopedFile cleanup(bridge);
        std::string c = quoted(cmd) + " decode " + quoted(in) + " "
            + quoted(bridge) + " --batch-size " + std::to_string(batch);
        if (grid.isstring()) c += " --grid " + quoted(grid);
        if (model.isstring()) c += " --model " + quoted(model);

        const CliResult r = runCli(c);
        if (r.status != 0) {
            cook.sopAddError(SOP_MESSAGE,
                             ("vqvdb decode failed: " + r.output).c_str());
            return;
        }
        GU_Detail* gdp = cook.gdh().gdpNC();
        gdp->clearAndDestroy();
        if (!gdp->load(bridge.c_str(), nullptr).success()) {
            cook.sopAddError(SOP_MESSAGE,
                             "Failed to load decoded grids from bridge file.");
            return;
        }
        cook.sopAddMessage(SOP_MESSAGE,
                           ("Decoded " + in.toStdString()).c_str());
    }
};

static SOP_NodeVerb::Register<DecoderVerb> theDecoderVerb;

class Decoder final : public SOP_Node {
public:
    static OP_Node* make(OP_Network* net, const char* name, OP_Operator* op)
    { return new Decoder(net, name, op); }

    static PRM_Template* templates() {
        static PRM_TemplateBuilder b("SOP_VQVDB.cpp(decoder)", kDecoderDs);
        return b.templates();
    }

protected:
    Decoder(OP_Network* net, const char* name, OP_Operator* op)
        : SOP_Node(net, name, op) {}
    OP_ERROR cookMySop(OP_Context& ctx) override
    { return cookMyselfAsVerb(ctx); }
    const SOP_NodeVerb* cookVerb() const override
    { return theDecoderVerb.get(); }
};

}  // namespace vqvdb_client

void newSopOperator(OP_OperatorTable* table) {
    table->addOperator(new OP_Operator(
        "vqvdb::encoder", "VQVDB Encoder (TPU)",
        vqvdb_client::Encoder::make, vqvdb_client::Encoder::templates(),
        1, 1));
    table->addOperator(new OP_Operator(
        "vqvdb::decoder", "VQVDB Decoder (TPU)",
        vqvdb_client::Decoder::make, vqvdb_client::Decoder::templates(),
        0, 0, nullptr, OP_FLAG_GENERATOR));
}
