/* nc3: minimal netCDF-3 reader+writer (see nc3.h) */

#include "nc3.h"

#include <cstdio>
#include <cstring>
#include <stdexcept>

namespace nc3 {

namespace {

constexpr uint32_t TAG_DIM = 10, TAG_VAR = 11, TAG_ATT = 12;

size_t type_size(Type t) {
    switch (t) {
        case NC_BYTE: case NC_CHAR: return 1;
        case NC_SHORT: return 2;
        case NC_INT: case NC_FLOAT: return 4;
        case NC_DOUBLE: return 8;
    }
    throw std::runtime_error("bad type");
}

struct Reader {
    std::FILE *fp;
    int version;  /* 1 = classic (32-bit offsets), 2 = 64-bit offsets */

    uint8_t u8() {
        int c = std::fgetc(fp);
        if (c == EOF) throw std::runtime_error("unexpected EOF");
        return static_cast<uint8_t>(c);
    }
    uint32_t u32() {
        uint32_t v = 0;
        for (int i = 0; i < 4; ++i) v = (v << 8) | u8();
        return v;
    }
    uint64_t u64() {
        uint64_t v = 0;
        for (int i = 0; i < 8; ++i) v = (v << 8) | u8();
        return v;
    }
    std::string name() {
        uint32_t len = u32();
        std::string s(len, '\0');
        if (len && std::fread(&s[0], 1, len, fp) != len)
            throw std::runtime_error("short read");
        size_t pad = (4 - len % 4) % 4;
        std::fseek(fp, static_cast<long>(pad), SEEK_CUR);
        return s;
    }
    void skip_values(Type t, uint32_t n) {
        size_t bytes = type_size(t) * n;
        bytes += (4 - bytes % 4) % 4;
        std::fseek(fp, static_cast<long>(bytes), SEEK_CUR);
    }
    std::string text_values(uint32_t n) {
        std::string s(n, '\0');
        if (n && std::fread(&s[0], 1, n, fp) != n)
            throw std::runtime_error("short read");
        size_t pad = (4 - n % 4) % 4;
        std::fseek(fp, static_cast<long>(pad), SEEK_CUR);
        return s;
    }
    double value(Type t) {
        switch (t) {
            case NC_BYTE: case NC_CHAR: return static_cast<int8_t>(u8());
            case NC_SHORT: {
                uint16_t v = (u8() << 8);
                v |= u8();
                return static_cast<int16_t>(v);
            }
            case NC_INT: return static_cast<int32_t>(u32());
            case NC_FLOAT: {
                uint32_t v = u32();
                float f;
                std::memcpy(&f, &v, 4);
                return f;
            }
            case NC_DOUBLE: {
                uint64_t v = u64();
                double d;
                std::memcpy(&d, &v, 8);
                return d;
            }
        }
        throw std::runtime_error("bad type");
    }
};

struct Writer {
    std::FILE *fp;

    void u8(uint8_t v) { std::fputc(v, fp); }
    void u32(uint32_t v) {
        for (int i = 3; i >= 0; --i) u8((v >> (8 * i)) & 0xff);
    }
    void u64(uint64_t v) {
        for (int i = 7; i >= 0; --i) u8((v >> (8 * i)) & 0xff);
    }
    void name(const std::string &s) {
        u32(static_cast<uint32_t>(s.size()));
        std::fwrite(s.data(), 1, s.size(), fp);
        size_t pad = (4 - s.size() % 4) % 4;
        for (size_t i = 0; i < pad; ++i) u8(0);
    }
    void value(Type t, double v) {
        switch (t) {
            case NC_INT: u32(static_cast<uint32_t>(static_cast<int32_t>(v))); return;
            case NC_DOUBLE: {
                uint64_t bits;
                std::memcpy(&bits, &v, 8);
                u64(bits);
                return;
            }
            case NC_FLOAT: {
                float f = static_cast<float>(v);
                uint32_t bits;
                std::memcpy(&bits, &f, 4);
                u32(bits);
                return;
            }
            default: throw std::runtime_error("write type unsupported");
        }
    }
};

}  /* namespace */

size_t File::dim_len(const std::string &nm) const {
    for (auto &d : dims)
        if (d.first == nm) return d.second;
    throw std::runtime_error("unknown dimension " + nm);
}

const Var *File::find(const std::string &nm) const {
    for (auto &v : vars)
        if (v.name == nm) return &v;
    return nullptr;
}

Var *File::find(const std::string &nm) {
    for (auto &v : vars)
        if (v.name == nm) return &v;
    return nullptr;
}

void File::add_dim(const std::string &nm, size_t len) { dims.emplace_back(nm, len); }

Var &File::add_var(const std::string &nm, Type type,
                   const std::vector<std::string> &dims_in) {
    Var var;
    var.name = nm;
    var.type = type;
    var.dims = dims_in;
    for (auto &d : dims_in) var.shape.push_back(dim_len(d));
    var.data.assign(var.size(), 0.0);
    vars.push_back(std::move(var));
    return vars.back();
}

File read(const std::string &fname) {
    std::FILE *fp = std::fopen(fname.c_str(), "rb");
    if (!fp) throw std::runtime_error("cannot open " + fname);
    Reader r{fp, 0};

    char magic[3];
    if (std::fread(magic, 1, 3, fp) != 3 || std::memcmp(magic, "CDF", 3))
        throw std::runtime_error(fname + ": not a netCDF-3 file");
    r.version = r.u8();
    if (r.version != 1 && r.version != 2)
        throw std::runtime_error("unsupported netCDF version");

    File file;
    uint32_t numrecs = r.u32();
    (void)numrecs;

    /* dimensions */
    uint32_t tag = r.u32(), cnt = r.u32();
    std::vector<std::pair<std::string, size_t>> dimlist;
    if (tag == TAG_DIM) {
        for (uint32_t i = 0; i < cnt; ++i) {
            std::string nm = r.name();
            uint32_t len = r.u32();
            dimlist.emplace_back(nm, len);
        }
    }
    file.dims = dimlist;

    /* global attributes */
    tag = r.u32();
    cnt = r.u32();
    if (tag == TAG_ATT) {
        for (uint32_t i = 0; i < cnt; ++i) {
            std::string nm = r.name();
            Type t = static_cast<Type>(r.u32());
            uint32_t n = r.u32();
            if (t == NC_CHAR) file.text_gatts[nm] = r.text_values(n);
            else r.skip_values(t, n);
        }
    }

    /* variables */
    tag = r.u32();
    cnt = r.u32();
    struct VarHdr { size_t var_ind; uint64_t begin; bool is_rec; };
    std::vector<VarHdr> hdrs;
    if (tag == TAG_VAR) {
        for (uint32_t i = 0; i < cnt; ++i) {
            Var var;
            var.name = r.name();
            uint32_t ndims = r.u32();
            bool is_rec = false;
            for (uint32_t d = 0; d < ndims; ++d) {
                uint32_t dimid = r.u32();
                var.dims.push_back(dimlist[dimid].first);
                size_t len = dimlist[dimid].second;
                if (d == 0 && len == 0) {
                    is_rec = true;
                    len = 1;  /* materialize the first record only */
                }
                var.shape.push_back(len);
            }
            uint32_t atag = r.u32(), acnt = r.u32();
            if (atag == TAG_ATT) {
                for (uint32_t a = 0; a < acnt; ++a) {
                    std::string nm = r.name();
                    Type t = static_cast<Type>(r.u32());
                    uint32_t n = r.u32();
                    if (t == NC_CHAR) var.text_attrs[nm] = r.text_values(n);
                    else r.skip_values(t, n);
                }
            }
            var.type = static_cast<Type>(r.u32());
            r.u32();  /* vsize */
            uint64_t begin = (r.version == 2) ? r.u64() : r.u32();
            file.vars.push_back(std::move(var));
            hdrs.push_back({file.vars.size() - 1, begin, is_rec});
        }
    }

    for (auto &hdr : hdrs) {
        Var &var = file.vars[hdr.var_ind];
        var.data.resize(var.size());
        std::fseek(fp, static_cast<long>(hdr.begin), SEEK_SET);
        for (size_t i = 0; i < var.data.size(); ++i)
            var.data[i] = r.value(var.type);
    }

    std::fclose(fp);
    return file;
}

void write(const std::string &fname, const File &file) {
    std::FILE *fp = std::fopen(fname.c_str(), "wb");
    if (!fp) throw std::runtime_error("cannot create " + fname);
    Writer w{fp};

    std::fwrite("CDF", 1, 3, fp);
    w.u8(2);  /* 64-bit offsets */
    w.u32(0); /* numrecs */

    /* dimensions */
    if (!file.dims.empty()) {
        w.u32(TAG_DIM);
        w.u32(static_cast<uint32_t>(file.dims.size()));
        for (auto &d : file.dims) {
            w.name(d.first);
            w.u32(static_cast<uint32_t>(d.second));
        }
    } else {
        w.u32(0);
        w.u32(0);
    }

    /* global text attributes */
    if (!file.text_gatts.empty()) {
        w.u32(TAG_ATT);
        w.u32(static_cast<uint32_t>(file.text_gatts.size()));
        for (auto &kv : file.text_gatts) {
            w.name(kv.first);
            w.u32(NC_CHAR);
            w.u32(static_cast<uint32_t>(kv.second.size()));
            std::fwrite(kv.second.data(), 1, kv.second.size(), fp);
            size_t pad = (4 - kv.second.size() % 4) % 4;
            for (size_t i = 0; i < pad; ++i) w.u8(0);
        }
    } else {
        w.u32(0);
        w.u32(0);
    }

    /* variable headers: compute begins after a first sizing pass */
    auto var_header_size = [&](const Var &v) {
        size_t s = 4 + ((v.name.size() + 3) / 4) * 4;  /* name */
        s += 4 + 4 * v.dims.size();                    /* ndims + dimids */
        s += 8;                                        /* attrs: tag + count */
        for (auto &kv : v.text_attrs)
            s += 4 + ((kv.first.size() + 3) / 4) * 4 + 8 +
                 ((kv.second.size() + 3) / 4) * 4;
        s += 4 + 4 + 8;  /* type + vsize + begin(64) */
        return s;
    };

    size_t header_size = 4 + 4;  /* magic+version, numrecs */
    header_size += 8;            /* dim tag+count */
    for (auto &d : file.dims)
        header_size += 4 + ((d.first.size() + 3) / 4) * 4 + 4;
    header_size += 8;
    for (auto &kv : file.text_gatts)
        header_size += 4 + ((kv.first.size() + 3) / 4) * 4 + 8 +
                       ((kv.second.size() + 3) / 4) * 4;
    header_size += 8;  /* var tag+count */
    for (auto &v : file.vars) header_size += var_header_size(v);

    std::vector<uint64_t> begins(file.vars.size());
    uint64_t offset = header_size;
    for (size_t i = 0; i < file.vars.size(); ++i) {
        begins[i] = offset;
        size_t bytes = file.vars[i].size() * type_size(file.vars[i].type);
        bytes += (4 - bytes % 4) % 4;
        offset += bytes;
    }

    /* variable list */
    if (!file.vars.empty()) {
        w.u32(TAG_VAR);
        w.u32(static_cast<uint32_t>(file.vars.size()));
    } else {
        w.u32(0);
        w.u32(0);
    }
    auto dim_index = [&](const std::string &nm) -> uint32_t {
        for (size_t i = 0; i < file.dims.size(); ++i)
            if (file.dims[i].first == nm) return static_cast<uint32_t>(i);
        throw std::runtime_error("unknown dimension " + nm);
    };
    for (size_t i = 0; i < file.vars.size(); ++i) {
        const Var &v = file.vars[i];
        w.name(v.name);
        w.u32(static_cast<uint32_t>(v.dims.size()));
        for (auto &d : v.dims) w.u32(dim_index(d));
        if (!v.text_attrs.empty()) {
            w.u32(TAG_ATT);
            w.u32(static_cast<uint32_t>(v.text_attrs.size()));
            for (auto &kv : v.text_attrs) {
                w.name(kv.first);
                w.u32(NC_CHAR);
                w.u32(static_cast<uint32_t>(kv.second.size()));
                std::fwrite(kv.second.data(), 1, kv.second.size(), fp);
                size_t pad = (4 - kv.second.size() % 4) % 4;
                for (size_t p = 0; p < pad; ++p) w.u8(0);
            }
        } else {
            w.u32(0);
            w.u32(0);
        }
        w.u32(v.type);
        size_t bytes = v.size() * type_size(v.type);
        bytes += (4 - bytes % 4) % 4;
        w.u32(static_cast<uint32_t>(bytes));
        w.u64(begins[i]);
    }

    /* data */
    for (auto &v : file.vars) {
        size_t bytes = 0;
        for (double d : v.data) {
            w.value(v.type, d);
            bytes += type_size(v.type);
        }
        size_t pad = (4 - bytes % 4) % 4;
        for (size_t p = 0; p < pad; ++p) w.u8(0);
    }

    std::fclose(fp);
}

}  /* namespace nc3 */
